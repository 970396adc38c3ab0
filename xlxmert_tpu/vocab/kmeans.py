"""TPU-native k-means visual vocabulary (replaces faiss; SURVEY.md §2.3).

Reference: feature_extraction/run_kmeans.py — faiss.Kmeans(2048, 10000,
niter=20) trained on (N*64, 2048) grid features (:96-113), then 1-NN
assignment via faiss.IndexFlatL2 (:123-151).

TPU design: both phases are (N, D) x (D, K) matmuls + argmin — pure MXU
work. Lloyd iterations run as one jitted step over the data mesh: each
device computes assignments for its shard; per-cluster sums/counts are
segment-sums that XLA reduces over the mesh (the psum the reference gets
from faiss's internal MPI-free loop). Assignment is chunked so the
(chunk, K) distance matrix stays HBM-resident.
"""
from __future__ import annotations

import functools
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _assign_chunk(x: jnp.ndarray, centroids: jnp.ndarray, k: int):
    """(n, D) -> (n,) nearest-centroid ids + (n,) squared distances.
    ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; the x.c term is the matmul."""
    x32 = x.astype(jnp.float32)
    c32 = centroids.astype(jnp.float32)
    dots = jax.lax.dot_general(
        x32, c32, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (n, K)
    c_norm = (c32 * c32).sum(axis=1)
    d = c_norm[None, :] - 2.0 * dots
    ids = jnp.argmin(d, axis=1)
    x_norm = (x32 * x32).sum(axis=1)
    dist = jnp.take_along_axis(d, ids[:, None], axis=1)[:, 0] + x_norm
    return ids.astype(jnp.int32), jnp.maximum(dist, 0.0)


def assign(x, centroids, chunk: int = 65536) -> np.ndarray:
    """Nearest-centroid assignment (IndexFlatL2 1-NN, run_kmeans.py:123-143),
    chunked over rows. Host-array in/out."""
    k = centroids.shape[0]
    centroids = jnp.asarray(centroids)
    out = []
    for i in range(0, x.shape[0], chunk):
        ids, _ = _assign_chunk(jnp.asarray(x[i:i + chunk]), centroids, k)
        out.append(np.asarray(ids))
    return np.concatenate(out) if out else np.zeros((0,), np.int32)


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(1,))
def lloyd_step(x: jnp.ndarray, centroids: jnp.ndarray, k: int):
    """One Lloyd iteration: assign + per-cluster mean update.
    Empty clusters keep their previous centroid. Returns
    (new_centroids, inertia)."""
    ids, dist = _assign_chunk(x, centroids, k)
    sums = jax.ops.segment_sum(x.astype(jnp.float32), ids, num_segments=k)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32), ids,
                                 num_segments=k)
    new = sums / jnp.maximum(counts[:, None], 1.0)
    new = jnp.where(counts[:, None] > 0, new, centroids)
    return new, dist.mean()


@functools.partial(jax.jit, static_argnames=("k", "chunk"),
                   donate_argnums=(2,))
def lloyd_step_chunked(x: jnp.ndarray, weights: jnp.ndarray,
                       centroids: jnp.ndarray, k: int, chunk: int):
    """Lloyd iteration that never materializes more than a (chunk, K)
    distance tile: `lax.scan` over row-chunks accumulating per-cluster
    fp32 sums/counts. This is what makes the production 10k-centroid
    build (run_kmeans.py:96-102 trains on millions of rows) fit one
    chip — the plain `lloyd_step`'s (N, K) matrix would be tens of GB.

    `x` must be padded to a multiple of `chunk`; `weights` (n,) carries
    1.0 for real rows and 0.0 for padding. Numerics equal `lloyd_step`
    on the real rows (fp32 accumulation both ways; pinned in
    tests/test_kmeans.py)."""
    n, d = x.shape
    xr = x.reshape(n // chunk, chunk, d)
    wr = weights.reshape(n // chunk, chunk)

    def body(carry, xw):
        sums, counts, tot = carry
        xc, wc = xw
        ids, dist = _assign_chunk(xc, centroids, k)
        w32 = wc.astype(jnp.float32)
        sums = sums + jax.ops.segment_sum(
            xc.astype(jnp.float32) * w32[:, None], ids, num_segments=k)
        counts = counts + jax.ops.segment_sum(w32, ids, num_segments=k)
        tot = tot + (dist * w32).sum()
        return (sums, counts, tot), None

    init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32),
            jnp.zeros((), jnp.float32))
    (sums, counts, tot), _ = jax.lax.scan(body, init, (xr, wr))
    new = sums / jnp.maximum(counts[:, None], 1.0)
    new = jnp.where(counts[:, None] > 0, new, centroids)
    return new, tot / jnp.maximum(weights.sum(), 1.0)


def _kmeanspp_init(data: np.ndarray, k: int, rng: np.random.RandomState):
    """k-means++ seeding (D^2 sampling). O(k*N*D) — right for small/medium
    k; the 10k-centroid production build uses random init like faiss."""
    n = data.shape[0]
    centers = [data[rng.randint(n)]]
    d2 = ((data - centers[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        p = d2 / max(d2.sum(), 1e-12)
        idx = rng.choice(n, p=p)
        centers.append(data[idx])
        d2 = np.minimum(d2, ((data - centers[-1]) ** 2).sum(axis=1))
    return np.stack(centers)


def kmeans(
    data: np.ndarray,
    k: int,
    n_iter: int = 20,
    seed: int = 0,
    init: str = "auto",
    verbose: bool = False,
    chunk: int = 0,
    store_dtype=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Train k-means; returns (centroids (k, D), final assignments (N,)).

    init: "random" = k distinct samples (faiss default; used for the
    production k=10000 build, run_kmeans.py:96-102), "++" = k-means++
    (better local minima for small k), "auto" = ++ when k <= 256.

    chunk: rows per distance tile. 0 = auto — one-shot `lloyd_step` while
    the (N, K) distance matrix stays under ~1 GB, `lloyd_step_chunked`
    beyond (production scale). Any positive value forces chunked.

    store_dtype: device-resident dtype for the data matrix (default:
    keep `data.dtype`). "bfloat16" halves HBM so the production build's
    millions of rows fit one chip; distances still accumulate in fp32 on
    the MXU, only the inputs are rounded — a documented divergence from
    faiss's fp32 storage.
    """
    n = data.shape[0]
    rng = np.random.RandomState(seed)
    if init == "auto":
        init = "++" if k <= 256 else "random"
    if init == "++":
        centroids = jnp.asarray(_kmeanspp_init(data, k, rng), jnp.float32)
    else:
        init_idx = rng.choice(n, size=k, replace=n < k)
        centroids = jnp.asarray(data[init_idx], jnp.float32)
    if chunk == 0 and n * k * 4 > 1 << 30:
        # balanced tiles instead of a hard 65536: N just over one tile
        # would otherwise pad up to ~2x with zero rows (wasted matmuls)
        n_tiles = -(-n // 65536)
        chunk = -(-(-(-n // n_tiles)) // 256) * 256
    x = jnp.asarray(data, dtype=store_dtype)
    if chunk:
        pad = (-n) % chunk
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[1]), x.dtype)])
        weights = jnp.concatenate(
            [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    for i in range(n_iter):
        t0 = time.time()
        if chunk:
            centroids, inertia = lloyd_step_chunked(x, weights, centroids,
                                                    k, chunk)
        else:
            centroids, inertia = lloyd_step(x, centroids, k)
        if verbose:
            print(f"kmeans iter {i}: inertia {float(inertia):.4f} "
                  f"({time.time() - t0:.2f}s)")
    final = assign(data, np.asarray(centroids))
    return np.asarray(centroids), final


def centroid_filename(encoder: str, cluster_src: str, n_centroids: int,
                      n_iter: int, d: int, grid: int) -> str:
    """Reference naming contract (lxmert_pretrain.py:72-75,
    main.py:51-56)."""
    return (f"{encoder}_{cluster_src}_centroids{n_centroids}"
            f"_iter{n_iter}_d{d}_grid{grid}.npy")
