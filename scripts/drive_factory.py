"""Offline-factory throughput on the real TPU chip: (a) k-means Lloyd
iterations at production-vocabulary shape (K=10000, D=2048), (b) batched
Detectron X-152-FPN grid-feature extraction at the reference's
min-800/max-1333 resolution.

The reference runs both phases off the accelerator-efficient path: the
extractors loop batch=1 over a CUDA detector (SURVEY.md §3.4,
coco_extract_grid_feature.py:236-260) and the vocabulary build is
hours-scale faiss CPU/GPU (run_kmeans.py:96-113). Here both are jitted
MXU programs.

Timing discipline (.claude/skills/verify/SKILL.md): inputs generated
device-side (tunnel H2D is ~12 MB/s), dependent iteration chains, one
scalar fetch per measurement — `block_until_ready` through the axon
tunnel does not actually block.

Usage:
  python scripts/drive_factory.py --kmeans [--rows 131072] [--k 10000]
  python scripts/drive_factory.py --extract [--batch 8] [--bf16]
  python scripts/drive_factory.py --kmeans --extract   # both
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--kmeans", action="store_true")
parser.add_argument("--extract", action="store_true")
parser.add_argument("--cpu", action="store_true")
# kmeans knobs
parser.add_argument("--rows", type=int, default=131072,
                    help="data rows (production build trains on millions; "
                    "rate is per-row so this extrapolates linearly)")
parser.add_argument("--k", type=int, default=10000)
parser.add_argument("--dim", type=int, default=2048)
parser.add_argument("--chunk", type=int, default=65536)
parser.add_argument("--iters", type=int, default=3)
parser.add_argument("--kmeans_bf16", action="store_true",
                    help="store the data matrix bf16 (halves HBM; "
                    "fp32 accumulation either way)")
# extract knobs
parser.add_argument("--batch", type=int, default=4,
                    help="B=8 fp32 OOMs 16G HBM (grouped-conv layout "
                    "pads 32x8 channels to 32x128); B=4 fp32 and "
                    "B=8 --bf16 both fit")
parser.add_argument("--height", type=int, default=800)
parser.add_argument("--width", type=int, default=1344,
                    help="max-1333 snapped to /32 (the reference canvas)")
parser.add_argument("--bf16", action="store_true",
                    help="bf16 backbone (fp32 is the parity-tested path)")
parser.add_argument("--extract_chain", type=int, default=4)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import xlxmert_tpu  # noqa: F401  (enables the persistent compile cache)

print("devices:", jax.devices())


def run_kmeans():
    from xlxmert_tpu.vocab.kmeans import lloyd_step_chunked

    N, K, D, chunk = args.rows, args.k, args.dim, args.chunk
    assert N % chunk == 0
    assert N >= K, f"--rows {N} must be >= --k {K} (centroid seeding)"
    dtype = jnp.bfloat16 if args.kmeans_bf16 else jnp.float32
    x = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype)
    w = jnp.ones((N,), jnp.float32)
    centroids = x[:K].astype(jnp.float32) + 0.0  # copy (donation)

    t0 = time.time()
    centroids, inertia = lloyd_step_chunked(x, w, centroids, K, chunk)
    print(f"kmeans compile+first iter {time.time()-t0:.1f}s "
          f"inertia {float(np.asarray(inertia)):.1f}")

    t0 = time.time()
    for _ in range(args.iters):
        centroids, inertia = lloyd_step_chunked(x, w, centroids, K, chunk)
    final = float(np.asarray(inertia))  # one fetch ends the chain
    dt = (time.time() - t0) / args.iters
    flops = 2.0 * N * D * K  # the assignment matmul dominates
    print(f"kmeans lloyd: N={N} K={K} D={D} chunk={chunk} "
          f"store={dtype.__name__}: {dt:.2f} s/iter "
          f"({N/dt:,.0f} rows/s, {flops/dt/1e12:.1f} eff TFLOP/s) "
          f"inertia {final:.1f}")
    n_prod = 2_560_000  # faiss default subsample: 256 pts/centroid * 10k
    print(f"  -> production 2.56M-row, 20-iter build: "
          f"{n_prod / (N/dt) * 20 / 60:.1f} min (extrapolated)")


def run_extract():
    from xlxmert_tpu.models.detectron import (
        DetectronConfig, DetectronGridExtractor)

    B, H, W = args.batch, args.height, args.width
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = DetectronConfig()
    model = DetectronGridExtractor(cfg, grid_size=8, dtype=dtype)

    images = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                               jnp.float32) * 50.0
    sizes = jnp.tile(jnp.asarray([[800, 1333]], jnp.int32), (B, 1))

    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, sizes)["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"detector init {time.time()-t0:.1f}s params {n_params/1e6:.1f}M")

    K = args.extract_chain

    @jax.jit
    def chain(params, images, sizes):
        def body(imgs, _):
            feats = model.apply({"params": params}, imgs, sizes)
            # consume the output so the K extractions are dependent
            # (pure timing device; perturbation ~1e-4 of pixel scale)
            return imgs + feats.mean().astype(imgs.dtype) * 1e-4, feats.mean()
        _, means = jax.lax.scan(body, images, None, length=K)
        return means

    t0 = time.time()
    m = chain(params, images, sizes)
    float(np.asarray(m)[-1])
    print(f"extract compile+first chain {time.time()-t0:.1f}s")

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        m = chain(params, images, sizes)
        float(np.asarray(m)[-1])
        best = min(best, time.time() - t0)
    per_img = best / (K * B)
    print(f"grid extract (X-152-FPN, {H}x{W}, B={B}, {dtype.__name__}): "
          f"{per_img*1e3:.1f} ms/img = {1/per_img:,.1f} img/s/chip "
          f"(COCO train2014 82,783 imgs in {82783*per_img/60:.1f} min)")


if not (args.kmeans or args.extract):
    args.kmeans = args.extract = True
if args.kmeans:
    run_kmeans()
if args.extract:
    run_extract()
print("OK")
