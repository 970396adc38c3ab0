"""Measure the grouped-conv einsum re-layout (CEILING.md §3b's one
untried extractor lever) on the real chip.

The X-152-32x8d backbone's 3x3 convs are feature_group_count=32 with
per-group channels Cg = 8/16/32/64 by stage. XLA's TPU lowering pads Cg
to the 128-lane tile ([B,H,W,G,Cg->128] temps, up to 16x HBM blow-up;
B=8 fp32 OOMs). `models/detectron.group_conv_mode(True)` rewrites each
one exactly as im2col + a G-batched einsum with contraction K=9*Cg
(models/detectron._grouped_conv_einsum; CPU-pinned exact in
tests/test_detectron_parity.py).

Two measurements, same discipline as scripts/drive_factory.py
(device-side inputs, loop-carried chains, one scalar fetch):
  1. isolated per-stage grouped conv (both lowerings)
  2. the full X-152-FPN grid extraction (both lowerings)

Usage:
  python scripts/drive_group_conv.py                # isolated probes
  python scripts/drive_group_conv.py --full         # + full extract
  python scripts/drive_group_conv.py --full --bf16 --batch 8
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=4)
parser.add_argument("--bf16", action="store_true")
parser.add_argument("--chain", type=int, default=16,
                    help="loop-carried iterations per isolated probe")
parser.add_argument("--full", action="store_true",
                    help="also time the full grid extraction both ways")
parser.add_argument("--extract_chain", type=int, default=4)
parser.add_argument("--modes", default="grouped,auto,einsum",
                    help="comma list of full-extract lowerings to time "
                    "(grouped|auto|einsum) — e.g. --modes auto to probe "
                    "whether stage1-einsum lets B=8 fp32 fit HBM")
parser.add_argument("--skip_isolated", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import xlxmert_tpu  # noqa: F401  (persistent compile cache)
from xlxmert_tpu.models import detectron as det

print("devices:", jax.devices())
dtype = jnp.bfloat16 if args.bf16 else jnp.float32
B = args.batch

# (H, W, C, Cg) at 800x1344: stage index s has C = 256*2^s bottleneck
# channels and Cg = 8*2^s per group; block counts (3, 8, 36, 3) make
# stage 2 (50x84, C=1024, Cg=32) the dominant cost.
STAGES = [
    ("stage1 (x3)", 200, 336, 256, 8),
    ("stage2 (x8)", 100, 168, 512, 16),
    ("stage3 (x36)", 50, 84, 1024, 32),
    ("stage4 (x3)", 25, 42, 2048, 64),
]


def time_chain(fn, *xs, n_warm=1, n_meas=3):
    out = fn(*xs)
    jax.tree.map(lambda t: t.block_until_ready(), out)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # real fetch
    best = float("inf")
    for _ in range(n_meas):
        t0 = time.time()
        out = fn(*xs)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.time() - t0)
    return best


def isolated():
    K = args.chain
    for name, h, w, c, cg in STAGES:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, h, w, c), dtype)
        kern = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cg, c),
                                  jnp.float32) * 0.05).astype(dtype)
        rows = {}
        for mode in (False, True):
            def chain(x, kern, _mode=mode):
                def body(h_, _):
                    det.GROUP_CONV_EINSUM = _mode  # traced once per jit
                    y = det._conv(h_, kern, 1, 1, 32)
                    return y, y.mean()
                _, m = jax.lax.scan(body, x, None, length=K)
                return m
            jitted = jax.jit(chain)
            dt = time_chain(jitted, x, kern) / K
            rows[mode] = dt
        flops = 2.0 * B * h * w * 9 * (c // 32) * c  # grouped MACs
        print(f"{name} ({B},{h},{w},{c}) Cg={cg} {dtype.__name__}: "
              f"grouped-conv {rows[False]*1e3:.2f} ms | einsum "
              f"{rows[True]*1e3:.2f} ms ({rows[False]/rows[True]:.2f}x, "
              f"{flops/rows[True]/1e12:.1f} vs "
              f"{flops/rows[False]/1e12:.1f} eff TFLOP/s)")


def full_extract():
    cfg = det.DetectronConfig()
    model = det.DetectronGridExtractor(cfg, grid_size=8, dtype=dtype)
    H, W = 800, 1344
    images = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                               jnp.float32) * 50.0
    sizes = jnp.tile(jnp.asarray([[800, 1333]], jnp.int32), (B, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images,
                                 sizes)["params"]
    K = args.extract_chain
    wanted = args.modes.split(",")
    mode_of = {"grouped": False, "auto": "auto", "einsum": True}
    for mode in [mode_of[w] for w in wanted]:
        det.group_conv_mode(mode)

        @jax.jit
        def chain(params, images, sizes):
            def body(imgs, _):
                feats = model.apply({"params": params}, imgs, sizes)
                return (imgs + feats.mean().astype(imgs.dtype) * 1e-4,
                        feats.mean())
            _, means = jax.lax.scan(body, images, None, length=K)
            return means

        label = {False: "grouped-conv", True: "einsum",
                 "auto": "hybrid(stage1-einsum)"}[mode]
        t0 = time.time()
        m = chain(params, images, sizes)
        float(np.asarray(m)[-1])
        print(f"  mode={label} compile+first {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            m = chain(params, images, sizes)
            float(np.asarray(m)[-1])
            best = min(best, time.time() - t0)
        per_img = best / (K * B)
        print(f"full extract (B={B}, {dtype.__name__}, {label}): "
              f"{per_img*1e3:.1f} ms/img = {1/per_img:,.1f} img/s/chip")
    det.group_conv_mode(False)


if not args.skip_isolated:
    isolated()
if args.full:
    full_extract()
print("OK")
