"""Measure the capped-modulation fast render (models/gan.render_mode).

The sampling decomposition (scripts/drive_sample_ablate.py) put the
256px SPADE render at 37.1 of the 60.3 ms sampling batch; ~90% of the
render FLOPs are the SPADE gamma/beta modulation convs at the two
largest resolutions, whose INPUT is a bilinear upsampling of the 8x8
code map — a smooth field. RENDER_MOD_CAP computes the modulation at a
capped resolution and upsamples gamma/beta instead, trading an exactly-
measurable deviation for most of those FLOPs.

Reports ms/batch + samples/s for exact and capped renders, and the
pixel deviation (outputs are tanh'd to [-1, 1]).

Usage: python scripts/drive_render_opt.py [--caps 32,64,128] [--batch 64]
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
    ap.add_argument("--caps", default="64")
    ap.add_argument("--target", type=int, default=256)
    ap.add_argument("--ablate", action="store_true",
                    help="instance-norm attribution variants at cap=32")
    ap.add_argument("--pack", action="store_true",
                    help="also measure phase-packed conv lowering "
                         "(exact math) for exact and capped renders")
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
    centroids = jax.random.normal(rng, (N_CODES, D), jnp.float32) * 0.1
    code = jnp.take(centroids.astype(jnp.bfloat16),
                    jax.random.randint(rng, (B * GRID * GRID,), 0, N_CODES),
                    axis=0).reshape(B, GRID, GRID, D)

    def make_run():
        # capture the CURRENT module switch at trace time
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

    def render_now():
        # fresh jit per mode — a reused jit object would replay the
        # trace from the previous RENDER_MOD_CAP setting
        return np.asarray(jax.jit(lambda p, s, c: gen.apply(
            {"params": p, "sn": s}, c, train=False))(
                g_params, g_sn, code), np.float32)

    gan_mod.render_mode(None)
    per = timed(make_run())
    img_exact = render_now()
    print(f"exact    : {per*1000:7.2f} ms/batch ({B/per:8.1f} samples/s)",
          flush=True)

    for cap in ns.caps.split(","):
        cap = int(cap)
        gan_mod.render_mode(cap)
        per = timed(make_run())
        d = np.abs(render_now() - img_exact)
        print(f"cap={cap:4d} : {per*1000:7.2f} ms/batch "
              f"({B/per:8.1f} samples/s)  |delta| mean {d.mean():.2e} "
              f"max {d.max():.2e} (pixel range [-1,1], png quantum "
              f"7.9e-3)", flush=True)
    gan_mod.render_mode(None)

    if ns.pack:
        try:
            gan_mod.conv_pack_mode(True)
            gan_mod.render_mode(None)
            per = timed(make_run())
            d = np.abs(render_now() - img_exact)
            print(f"exact+pack    : {per*1000:7.2f} ms/batch "
                  f"({B/per:8.1f} samples/s)  |delta| mean {d.mean():.2e} "
                  f"max {d.max():.2e} (bf16 rounding only)", flush=True)
            for cap in ns.caps.split(","):
                gan_mod.render_mode(int(cap))
                per = timed(make_run())
                d = np.abs(render_now() - img_exact)
                print(f"cap={int(cap):4d}+pack : {per*1000:7.2f} ms/batch "
                      f"({B/per:8.1f} samples/s)  |delta| mean "
                      f"{d.mean():.2e} max {d.max():.2e}", flush=True)
        finally:
            gan_mod.conv_pack_mode(False)
            gan_mod.render_mode(None)

    if ns.ablate:
        # attribution: what do the instance norms cost at cap=32?
        orig_in = gan_mod.instance_norm
        gan_mod.render_mode(32)
        try:
            gan_mod.instance_norm = lambda x, eps=1e-5: x  # identity
            per = timed(make_run())
            print(f"cap32+no_IN   : {per*1000:7.2f} ms/batch "
                  f"({B/per:8.1f} samples/s) [attribution only]",
                  flush=True)
            gan_mod.instance_norm = (
                lambda x, eps=1e-5: orig_in(x.astype(jnp.bfloat16), eps))
            per = timed(make_run())
            d = np.abs(render_now() - img_exact)
            print(f"cap32+IN_bf16 : {per*1000:7.2f} ms/batch "
                  f"({B/per:8.1f} samples/s)  |delta| mean "
                  f"{d.mean():.2e} max {d.max():.2e}", flush=True)
        finally:
            gan_mod.instance_norm = orig_in
            gan_mod.render_mode(None)


if __name__ == "__main__":
    main()
