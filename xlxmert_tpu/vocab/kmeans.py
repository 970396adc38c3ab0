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
) -> Tuple[np.ndarray, np.ndarray]:
    """Train k-means; returns (centroids (k, D), final assignments (N,)).

    init: "random" = k distinct samples (faiss default; used for the
    production k=10000 build, run_kmeans.py:96-102), "++" = k-means++
    (better local minima for small k), "auto" = ++ when k <= 256.
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
    x = jnp.asarray(data)
    for i in range(n_iter):
        centroids, inertia = lloyd_step(x, centroids, k)
        if verbose:
            print(f"kmeans iter {i}: inertia {float(inertia):.4f}")
    final = assign(data, np.asarray(centroids))
    return np.asarray(centroids), final


def centroid_filename(encoder: str, cluster_src: str, n_centroids: int,
                      n_iter: int, d: int, grid: int) -> str:
    """Reference naming contract (lxmert_pretrain.py:72-75,
    main.py:51-56)."""
    return (f"{encoder}_{cluster_src}_centroids{n_centroids}"
            f"_iter{n_iter}_d{d}_grid{grid}.npy")
