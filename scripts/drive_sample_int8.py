"""Measure int8 NAR sampling + SPADE render vs the bf16 sampler on TPU.

Same workload as bench.py's sampling config (NAR mask-predict 4 steps,
8x8 grid, 10k clusters, 256px render, scripts/sample_images.sh
semantics), scan-chain timing.

Usage: python scripts/drive_sample_int8.py [--batch 64] [--steps 4]
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
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--mode", choices=["NAR", "AR"], default="NAR")
    ap.add_argument("--skip_bf16", action="store_true")
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.models.gan import Generator
    from xlxmert_tpu.models.lxmert import serving_mode
    from xlxmert_tpu.models.xlxmert import XLxmert
    from xlxmert_tpu.serving.lxmert_int8 import apply_calibration
    from xlxmert_tpu.serving.sampling_int8 import (
        calibrate_sampler, make_nar_sampler_int8, prepare_sampler_params,
    )
    from xlxmert_tpu.tasks.sampling import make_nar_sampler

    print("devices:", jax.devices())
    cfg = LxmertConfig()
    serving_mode(True)
    B, L = ns.batch, 20
    N_STEPS, GRID, N_CODES = ns.steps, 8, 10000
    K_SMALL, K_BIG = 1, 5

    model = XLxmert(cfg, dtype=jnp.bfloat16)
    gen = Generator(emb_dim=cfg.visual_feat_dim, base_dim=32,
                    target_size=256, init_H=GRID, init_W=GRID,
                    codebook_dim=256, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)
    centroids = (jax.random.normal(
        rng, (N_CODES, cfg.visual_feat_dim), jnp.float32) * 0.1)

    params = jax.jit(lambda r: model.init(
        r, ids, jnp.zeros((B, GRID * GRID, cfg.visual_feat_dim)),
        jnp.zeros((B, GRID * GRID, 4)), attention_mask=mask,
        centroids=centroids, heads=("obj",))["params"])(rng)
    g_vars = jax.jit(lambda r: gen.init(
        {"params": r, "noise": r},
        jnp.zeros((B, GRID, GRID, cfg.visual_feat_dim)), train=False))(rng)
    g_params, g_sn = g_vars["params"], g_vars.get("sn", {})

    np_params = jax.tree.map(np.asarray, dict(params))
    sp = prepare_sampler_params(np_params, cfg, np.asarray(centroids))
    calib = calibrate_sampler(sp, centroids, ids[:8], mask[:8], cfg,
                              grid_size=GRID)
    ssp = apply_calibration(sp, calib)

    def timed(run, args, reps=2):
        def t(k):
            ks = jnp.zeros((k, 1))
            float(run(*args, ks, jnp.float32(0.0)))
            best = float("inf")
            for r in range(reps):
                t0 = time.time()
                float(run(*args, ks, jnp.float32(r)))
                best = min(best, time.time() - t0)
            return best

        per_iter = (t(K_BIG) - t(K_SMALL)) / (K_BIG - K_SMALL)
        return B / per_iter

    if ns.mode == "AR":
        from xlxmert_tpu.serving.sampling_int8 import make_ar_sampler_int8
        from xlxmert_tpu.tasks.sampling import make_ar_sampler

        ar_i8 = make_ar_sampler_int8(cfg, GRID, "confidence")
        ar_bf = make_ar_sampler(model, GRID, "confidence")

        def sampler_i8(ssp, centroids, ids, mask):
            code, cl = ar_i8(ssp, centroids, ids, mask)
            return code, cl, None

        def sampler_bf16(params, centroids, ids, mask):
            code, cl = ar_bf(params, centroids, ids, mask)
            return code, cl, None
    else:
        sampler_i8 = make_nar_sampler_int8(cfg, N_STEPS, GRID)

    @jax.jit
    def run_i8(ssp, centroids, g_params, g_sn, ids, mask, ks, seed):
        def body(carry, _):
            code, _, _ = sampler_i8(ssp, centroids + carry * 1e-6, ids,
                                    mask)
            img = gen.apply({"params": g_params, "sn": g_sn},
                            code.astype(jnp.bfloat16), train=False)
            return carry + img.mean().astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, seed, ks)
        return c

    label = ns.mode if ns.mode == "AR" else f"NAR x{N_STEPS}"
    sps = timed(run_i8, (ssp, centroids, g_params, g_sn, ids, mask))
    print(f"int8 {label} + render: {sps:8.1f} samples/s")

    if not ns.skip_bf16:
        sampler_bf = (sampler_bf16 if ns.mode == "AR"
                      else make_nar_sampler(model, N_STEPS, GRID))

        @jax.jit
        def run_bf(params, centroids, g_params, g_sn, ids, mask, ks, seed):
            def body(carry, _):
                code, _, _ = sampler_bf(params, centroids + carry * 1e-6,
                                        ids, mask)
                img = gen.apply({"params": g_params, "sn": g_sn}, code,
                                train=False)
                return carry + img.mean().astype(jnp.float32), ()

            c, _ = jax.lax.scan(body, seed, ks)
            return c

        sps = timed(run_bf, (params, centroids, g_params, g_sn, ids, mask))
        print(f"bf16 {label} + render: {sps:8.1f} samples/s")


if __name__ == "__main__":
    main()
