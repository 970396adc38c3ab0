"""TPU measurement for the AR sampler levers (CEILING.md §2b):

  - confidence (reference default, full head) — the round-3 155/s line;
  - TLBR full head vs TLBR selective head (the exact 22%-FLOP lever);
  - each with/without int8 attention einsums.

Decode loop only (no render): AR throughput is encoder-bound, unlike
NAR which is render-bound (CEILING.md §2).

Run on the chip:  python scripts/drive_ar.py [--batch 64]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--grid", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.models.xlxmert import XLxmert
    from xlxmert_tpu.serving import lxmert_int8 as engine
    from xlxmert_tpu.serving.sampling_int8 import (
        calibrate_sampler, make_ar_sampler_int8, prepare_sampler_params)

    cfg = LxmertConfig()
    print("devices:", jax.devices())
    B, L, GRID, N_CODES = args.batch, 20, args.grid, 10000
    K_SMALL, K_BIG = 1, 5

    model = XLxmert(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)
    centroids_np = (np.random.RandomState(0)
                    .randn(N_CODES, cfg.visual_feat_dim)
                    .astype(np.float32) * 0.1)
    centroids = jnp.asarray(centroids_np)

    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.jit(lambda r: model.init(
            r, jnp.ones((8, L), jnp.int32),
            jnp.zeros((8, GRID * GRID, cfg.visual_feat_dim)),
            jnp.zeros((8, GRID * GRID, 4)),
            attention_mask=jnp.ones((8, L), jnp.float32),
            centroids=jnp.asarray(centroids_np),
            heads=("obj",))["params"])(rng)
    np_params = jax.tree.map(np.asarray, dict(params))
    sp = prepare_sampler_params(np_params, cfg, centroids_np)
    calib = calibrate_sampler(sp, centroids, ids[:8], mask[:8], cfg,
                              grid_size=GRID)
    ssp = engine.apply_calibration(sp, calib)

    def timed(sampler, extra=()):
        @jax.jit
        def chain(ssp, centroids, ids, mask, ks, seed, *extra_args):
            def body(carry, _):
                _, cl = sampler(ssp, centroids + carry * 1e-6, ids, mask,
                                *extra_args)
                return carry + cl.mean().astype(jnp.float32), ()

            c, _ = jax.lax.scan(body, seed, ks)
            return c

        def t(k):
            ks = jnp.zeros((k, 1))
            float(chain(ssp, centroids, ids, mask, ks, jnp.float32(0),
                        *extra))
            best = float("inf")
            for r in range(args.reps):
                t0 = time.time()
                float(chain(ssp, centroids, ids, mask, ks,
                            jnp.float32(r), *extra))
                best = min(best, time.time() - t0)
            return best

        per = (t(K_BIG) - t(K_SMALL)) / (K_BIG - K_SMALL)
        return B / per

    out = {}
    variants = [
        ("confidence_full", "confidence", True, ()),
        ("tlbr_full_head", "TLBR", False, ()),
        ("tlbr_selective_head", "TLBR", True, ()),
    ]
    for name, strategy, selective, extra in variants:
        # make_ar_sampler_int8 returns a jitted fn; unwrap for chaining
        fn = make_ar_sampler_int8(cfg, grid_size=GRID, strategy=strategy,
                                  selective_head=selective)
        raw = getattr(fn, "__wrapped__", fn)
        sps = timed(raw, extra)
        out[name] = sps
        print(f"{name:24s} {sps:8.1f} samples/s", flush=True)

    engine.int8_attention(True)
    try:
        for name, strategy, selective in (
                ("confidence_int8att", "confidence", True),
                ("tlbr_selective_int8att", "TLBR", True)):
            fn = make_ar_sampler_int8(cfg, grid_size=GRID,
                                      strategy=strategy,
                                      selective_head=selective)
            raw = getattr(fn, "__wrapped__", fn)
            sps = timed(raw)
            out[name] = sps
            print(f"{name:24s} {sps:8.1f} samples/s", flush=True)
    finally:
        engine.int8_attention(False)

    print(json.dumps({k: round(v, 1) for k, v in out.items()}))


if __name__ == "__main__":
    main()
