"""HBM-resident image-feature cache for serving.

The reference streams full grid features from h5 per query
(/root/reference/x-lxmert/src/tasks/vqa_data.py:159-172 — 512 KB/query
of fp32 across PCIe). The TPU-native serving design keeps the feature
table resident in device HBM instead: a query ships only its token ids
plus an image INDEX (~100 B), and the features are gathered on-chip.
Measured on the serving drive (scripts/drive_serving_e2e.py): 7,567 q/s
end to end vs 50 q/s streaming over a thin host link — and on any host
it removes ~5 GB/s of steady-state H2D at the 10k q/s device rate.

Sizing: COCO val2014 (~41k images) at 8x8x2048 bf16 is ~10 GB — fits a
single v5e chip's HBM next to the int8 params. Larger catalogs shard
the table's image axis over the mesh `data` axis: `jnp.take` on a
sharded table compiles to an XLA gather + collective over ICI, and each
chip holds 1/N of the table.

Usage:
    cache = FeatureCache.build(reader, img_ids)        # host -> HBM
    idx   = cache.indices(batch_img_ids)               # host-side dict
    # inside any jitted serving fn:
    feats = cache.lookup(table, idx)                   # on-device gather

The table is exposed as a plain array (`cache.table`) so it can be an
explicit jit argument — closure-captured device arrays would be baked
into the HLO (see bench.py's note on the axon tunnel).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class FeatureCache:
    """Maps img_id -> row in an HBM-resident (N, V, D) feature table."""

    def __init__(self, table: jax.Array, index: Dict[str, int]):
        self.table = table
        self.index = index

    @classmethod
    def build(cls, reader, img_ids: Sequence[str],
              dtype=jnp.bfloat16, mesh=None,
              shard_axis: str = "data") -> "FeatureCache":
        """Load features for `img_ids` from a GridFeatureReader-like
        object (``.get(img_id) -> (g, g, D)``) into one device table.

        With `mesh`, the image axis is sharded over `shard_axis` so each
        chip holds 1/N of the catalog (pad rows replicate the last image
        if N is not divisible). Without, the table lives on the default
        device.

        NOTE: build at catalog scale with a read-through reader
        (GridFeatureReader(..., cache=None)) — a cache="ram" reader
        would retain every fp32 row alongside the staged table,
        tripling peak host memory."""
        img_ids = [str(i) for i in img_ids]
        if not img_ids:
            raise ValueError("FeatureCache.build: empty img_ids — nothing "
                             "to cache (does the query set reference any "
                             "images?)")
        first = np.asarray(reader.get(img_ids[0]), np.float32)
        v = first.shape[0] * first.shape[1]
        n = len(img_ids)
        n_pad = 0
        if mesh is not None:
            n_pad = (-n) % mesh.shape[shard_axis]
        # staged directly in the target dtype (np.dtype(jnp.bfloat16) is
        # valid via ml_dtypes): rows cast on assignment, so peak host
        # memory is one catalog, not fp32 + cast copies (~30 GB vs
        # ~10 GB at COCO-val scale)
        host = np.empty((n + n_pad, v, first.shape[-1]), np.dtype(dtype))
        host[0] = first.reshape(v, -1)
        for j, i in enumerate(img_ids[1:], start=1):
            host[j] = np.asarray(reader.get(i), np.float32).reshape(v, -1)
        for j in range(n, n + n_pad):
            host[j] = host[n - 1]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            table = jax.device_put(host, NamedSharding(mesh, P(shard_axis)))
        else:
            table = jnp.asarray(host)
        return cls(table, {i: j for j, i in enumerate(img_ids)})

    def indices(self, img_ids: Sequence[str]) -> np.ndarray:
        """Host-side id -> row lookup for one batch."""
        return np.asarray([self.index[str(i)] for i in img_ids], np.int32)

    @staticmethod
    def lookup(table: jax.Array, idx: jax.Array) -> jax.Array:
        """On-device gather: (N, V, D) table + (B,) indices -> (B, V, D).
        Safe inside jit; on a sharded table XLA lowers it to a gather +
        ICI collective."""
        return jnp.take(table, idx, axis=0)

    @property
    def nbytes(self) -> int:
        return self.table.size * self.table.dtype.itemsize
