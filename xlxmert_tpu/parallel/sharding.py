"""Tensor-parallel parameter sharding over the mesh "model" axis.

The reference has no TP (SURVEY.md §2.4 — DDP only); this is the
TPU-native extension its ~240M-param scale doesn't need but the mesh
design allows: classic Megatron-style column/row pairing expressed as
GSPMD shardings — XLA inserts the collectives.

  - attention q/k/v projections and the FFN intermediate: COLUMN-sharded
    (kernel P(None, "model"), bias P("model")) — each model-shard owns a
    slice of heads / hidden units;
  - attention output projection and the FFN output: ROW-sharded
    (kernel P("model", None), bias replicated) — consumes the sharded
    activation, XLA reduce-scatters/all-reduces the partial sums;
  - embeddings, LayerNorms, heads: replicated (tiny).

Used by PretrainEngine when the mesh has a "model" axis > 1 and by
__graft_entry__.dryrun_multichip (dp x tp mesh).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_MARKERS = ("/query/", "/key/", "/value/", "/intermediate/",
                  "_inter/")
ROW_MARKERS = ("output/dense",)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path) + "/"


def lxmert_param_spec(path, leaf) -> P:
    """PartitionSpec for one param by its tree path (Megatron pairing)."""
    p = _path_str(path)
    if leaf.ndim == 2:
        if any(m in p for m in COLUMN_MARKERS):
            return P(None, "model")
        if any(m in p for m in ROW_MARKERS):
            return P("model", None)
    if leaf.ndim == 1 and any(m in p for m in COLUMN_MARKERS) \
            and p.rstrip("/").endswith("bias"):
        return P("model")
    return P()


def param_shardings(params: Any, mesh: Mesh):
    """Pytree of NamedShardings matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, lxmert_param_spec(path, leaf)),
        params)


def shard_params(params: Any, mesh: Mesh):
    """Place params on the mesh with TP shardings (replicated where no
    rule applies)."""
    return jax.tree_util.tree_map(
        jax.device_put, params, param_shardings(params, mesh))
