"""Attribute the fast render's time (cap=32, B=64: ~28 ms) to its three
cost classes: 3x3 convs, bilinear resizes, remainder (elementwise chain
+ instance norm). Decides the next render lever:

- conv-dominated  -> lane-fill rewrites (phase packing) or int8 convs
- resize-dominated-> cheaper upsampling (nearest-feed + one final
                     bilinear, or fused depth-to-space)
- remainder       -> pass-fusion (fewer HBM round trips), not FLOPs

Variants are ATTRIBUTION ONLY (wrong math): convs are replaced by a
zero-cost broadcast with a data dependency, resizes by nearest repeats
(same bytes written, no interp matmuls).

Usage: python scripts/drive_render_attrib.py [--batch 64] [--cap 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cap", type=int, default=32)
    ap.add_argument("--target", type=int, default=256)
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.models import gan as gan_mod
    from xlxmert_tpu.models.gan import Generator

    print("devices:", jax.devices())
    B, GRID, N_CODES, D = ns.batch, 8, 10000, 2048
    K_SMALL, K_BIG = 1, 5
    gen = Generator(emb_dim=D, base_dim=32, target_size=ns.target,
                    init_H=GRID, init_W=GRID, codebook_dim=256,
                    dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    g_vars = jax.jit(lambda r: gen.init(
        {"params": r, "noise": r},
        jnp.zeros((B, GRID, GRID, D)), train=False))(rng)
    g_params, g_sn = g_vars["params"], g_vars.get("sn", {})
    code = jax.random.normal(rng, (B, GRID, GRID, D), jnp.bfloat16) * 0.1

    def make_run():
        @jax.jit
        def run(g_params_, g_sn_, code_, ks, seed):
            def body(carry, _):
                img = gen.apply(
                    {"params": g_params_, "sn": g_sn_},
                    code_ + carry.astype(jnp.bfloat16) * 1e-6, train=False)
                return carry + img.mean().astype(jnp.float32), ()

            c, _ = jax.lax.scan(body, seed, ks)
            return c

        return run

    def timed(run, reps=3):
        def t(k):
            ks = jnp.zeros((k, 1))
            float(run(g_params, g_sn, code, ks, jnp.float32(0.0)))
            best = float("inf")
            for r in range(reps):
                t0 = time.time()
                float(run(g_params, g_sn, code, ks, jnp.float32(r)))
                best = min(best, time.time() - t0)
            return best

        return (t(K_BIG) - t(K_SMALL)) / (K_BIG - K_SMALL)

    real_conv = jax.lax.conv_general_dilated
    real_resize = gan_mod.resize_bilinear

    def fake_conv(x, kernel, window_strides, padding, **kw):
        # render convs are all stride-1 SAME; output = (B,H,W,Cout)
        dep = x[..., :1].astype(x.dtype)  # keep a data dependency
        return jnp.broadcast_to(dep, x.shape[:3] + (kernel.shape[-1],)) \
            * kernel[0, 0, 0, :].astype(x.dtype)

    def fake_resize(x, size):
        Bx, H, W, C = x.shape
        if size[0] % H == 0 and size[1] % W == 0:
            return jnp.repeat(jnp.repeat(x, size[0] // H, 1),
                              size[1] // W, 2)
        return real_resize(x, size)

    gan_mod.render_mode(ns.cap)
    try:
        base = timed(make_run())
        print(f"cap={ns.cap} base      : {base*1e3:7.2f} ms/batch "
              f"({B/base:8.1f} samples/s)", flush=True)

        jax.lax.conv_general_dilated = fake_conv
        no_conv = timed(make_run())
        print(f"no_conv            : {no_conv*1e3:7.2f} ms/batch "
              f"(conv share ~{(base-no_conv)*1e3:6.2f} ms)", flush=True)
        jax.lax.conv_general_dilated = real_conv

        gan_mod.resize_bilinear = fake_resize
        no_rs = timed(make_run())
        print(f"no_resize(nearest) : {no_rs*1e3:7.2f} ms/batch "
              f"(interp-matmul share ~{(base-no_rs)*1e3:6.2f} ms)",
              flush=True)

        jax.lax.conv_general_dilated = fake_conv
        neither = timed(make_run())
        print(f"neither            : {neither*1e3:7.2f} ms/batch "
              f"(remainder = elementwise+IN+bytes)", flush=True)
    finally:
        jax.lax.conv_general_dilated = real_conv
        gan_mod.resize_bilinear = real_resize
        gan_mod.render_mode(None)


if __name__ == "__main__":
    main()
