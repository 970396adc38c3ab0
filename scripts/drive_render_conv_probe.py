"""Probe the exact-render conv rewrites at the SPADE render's real shapes.

The exact 256px render runs ~46 eff-TFLOP/s (docs/CEILING.md) because
its convs have Cout=32 — a quarter of the 128 MXU lanes. Two exact-math
rewrites could fill the lanes:

1. gamma/beta merge: SPADE computes gamma and beta as two separate
   3x3 convs (128->32) over the same activation; one 128->64 conv with
   concatenated kernels is the same math with twice the lane fill.
2. phase packing: a 3x3 stride-1 conv (Cin->Cout) equals a 4x4
   stride-2 conv (Cin->4*Cout, padding (1,2)) whose 2x2 output phases
   are interleaved back (depth-to-space). 16/9 more FLOPs but full
   128-lane output tiles at Cout=32.

This script measures both against their baselines at the render's two
largest resolutions and checks the phase-packed numerics exactly.

Usage: python scripts/drive_render_conv_probe.py [--batch 64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def phase_pack_kernel(w):
    """(3,3,Cin,Cout) -> (4,4,Cin,4*Cout) phase-packed kernel.

    out[2i+dy, 2j+dx] = sum_{u,v} w[u,v] x[2i+dy+u-1, 2j+dx+v-1]; with
    4x4 patches anchored at x[2i-1, 2j-1], entry (r, c) serves phase
    (dy, dx) with tap w[r-dy, c-dx].
    """
    import jax.numpy as jnp

    cin, cout = w.shape[2], w.shape[3]
    wb = np.zeros((4, 4, cin, 2, 2, cout), np.float32)
    w_np = np.asarray(w, np.float32)
    for dy in range(2):
        for dx in range(2):
            wb[dy:dy + 3, dx:dx + 3, :, dy, dx, :] = w_np
    return jnp.asarray(wb.reshape(4, 4, cin, 4 * cout))


def depth_to_space2(y):
    """(B, H, W, 2, 2, C) phases -> (B, 2H, 2W, C)."""
    B, H, W, _, _, C = y.shape
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--only", choices=["gb", "phase"], default=None,
                    help="run just one experiment (gb merge already "
                         "measured: 0.65-0.72x, a loss)")
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    B = ns.batch
    K_SMALL, K_BIG = 2, 10

    def conv(x, w, stride=1, padding="SAME"):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def timed(fn, *args):
        run = jax.jit(fn, static_argnums=())

        def t(k):
            ks = jnp.zeros((k, 1))
            np.asarray(run(*args, ks, jnp.float32(0.0)))
            best = float("inf")
            for r in range(3):
                t0 = time.time()
                np.asarray(run(*args, ks, jnp.float32(r)))
                best = min(best, time.time() - t0)
            return best

        return (t(K_BIG) - t(K_SMALL)) / (K_BIG - K_SMALL)

    rng = np.random.RandomState(0)

    def loop(body_fn):
        def run(*args_ks_seed):
            *args, ks, seed = args_ks_seed

            def body(carry, _):
                y = body_fn(*args, carry)
                return carry + y.astype(jnp.float32).mean() * 1e-6, ()

            c, _ = jax.lax.scan(body, seed, ks)
            return c

        return run

    # --- 1. gamma/beta merge at the SPADE modulation shapes ---------
    for H in (128, 256) if ns.only in (None, "gb") else ():
        x = jnp.asarray(rng.randn(B, H, H, 128) * 0.1, jnp.bfloat16)
        wg = jnp.asarray(rng.randn(3, 3, 128, 32) * 0.05, jnp.bfloat16)
        wb_ = jnp.asarray(rng.randn(3, 3, 128, 32) * 0.05, jnp.bfloat16)
        wm = jnp.concatenate([wg, wb_], axis=-1)

        per_sep = timed(loop(
            lambda x_, wg_, wb2, c: conv(x_ + c.astype(x_.dtype), wg_)
            + conv(x_ + c.astype(x_.dtype), wb2)), x, wg, wb_)
        per_mrg = timed(loop(
            lambda x_, wm_, c: conv(x_ + c.astype(x_.dtype), wm_)
            .reshape(B, H, H, 2, 32).sum(3)), x, wm)
        fl = 2 * B * H * H * 9 * 128 * 64
        print(f"gb {H}x{H} sep  : {per_sep*1e3:8.3f} ms "
              f"{fl/per_sep/1e12:6.1f} TFLOP/s", flush=True)
        print(f"gb {H}x{H} merge: {per_mrg*1e3:8.3f} ms "
              f"{fl/per_mrg/1e12:6.1f} TFLOP/s "
              f"({per_sep/per_mrg:.2f}x)", flush=True)

    # --- 2. phase packing for the 32->32 main convs -----------------
    H = 256
    x = jnp.asarray(rng.randn(B, H, H, 32) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 32, 32) * 0.05, jnp.bfloat16)
    wp = phase_pack_kernel(w).astype(jnp.bfloat16)

    # numerics check (fp32 kernels to isolate layout error from rounding)
    xf = x.astype(jnp.float32)
    ref = np.asarray(conv(xf, w.astype(jnp.float32)))
    got = np.asarray(depth_to_space2(conv(
        xf, wp.astype(jnp.float32), stride=2,
        padding=((1, 2), (1, 2))).reshape(B, H // 2, H // 2, 2, 2, 32)))
    err = np.abs(ref - got).max()
    print(f"phase-pack max |err| fp32: {err:.2e}", flush=True)

    per_base = timed(loop(
        lambda x_, w_, c: conv(x_ + c.astype(x_.dtype), w_)), x, w)
    per_phase = timed(loop(
        lambda x_, wp_, c: depth_to_space2(conv(
            x_ + c.astype(x_.dtype), wp_, stride=2,
            padding=((1, 2), (1, 2))).reshape(B, H // 2, H // 2, 2, 2, 32))),
        x, wp)
    fl = 2 * B * H * H * 9 * 32 * 32
    print(f"main 256x256 32->32 conv : {per_base*1e3:8.3f} ms "
          f"{fl/per_base/1e12:6.1f} TFLOP/s", flush=True)
    print(f"main 256x256 phase-pack  : {per_phase*1e3:8.3f} ms "
          f"{fl/per_phase/1e12:6.1f} eff-TFLOP/s "
          f"({per_base/per_phase:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
