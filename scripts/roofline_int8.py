"""Standalone int8/bf16 matmul roofline at the VQA serving shapes.

Independently reproduces the 287 TOP/s int8 figure that
docs/CEILING.md's VQA ceiling argument rests on (VERDICT r3 "what's
weak" #2: the claim rested on one microbench inside the engine).

Method: for each serving-shape GEMM, chain K loop-carried matmuls
inside ONE jitted lax.scan (the carry feeds the next input, so XLA
cannot hoist or parallelize them) and fetch one scalar; timing
differences two chain lengths to cancel dispatch/tunnel constants —
the same discipline as bench.py (block_until_ready is unreliable
through the axon tunnel, .claude/skills/verify/SKILL.md).

Run:  python scripts/roofline_int8.py [--cpu] [--reps 3]
Prints per-shape int8 and bf16 TOP/s and the FLOP-weighted mean over
the serving mix.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (name, M, K, N, weight): the int8 engine's GEMM mix for one B=256
# VQA forward (serving/lxmert_int8.py) — M is rows (B*L or B*V), weight
# is how many times the shape occurs per forward.
SHAPES = [
    ("lang qkv (B*20,768,2304)", 256 * 20, 768, 2304, 9),
    ("lang out  (B*20,768,768)", 256 * 20, 768, 768, 9),
    ("lang ffn1 (B*20,768,3072)", 256 * 20, 768, 3072, 9),
    ("lang ffn2 (B*20,3072,768)", 256 * 20, 3072, 768, 9),
    ("visn qkv (B*64,768,2304)", 256 * 64, 768, 2304, 10),
    ("visn ffn1 (B*64,768,3072)", 256 * 64, 768, 3072, 10),
    ("x kv     (B*64,768,1536)", 256 * 64, 768, 1536, 5),
]


def measure_shape(M, K, N, dtype, reps):
    import jax
    import jax.numpy as jnp

    if dtype == "int8":
        x0 = jnp.asarray(
            np.random.RandomState(0).randint(-127, 127, (M, K)), jnp.int8)
        w = jnp.asarray(
            np.random.RandomState(1).randint(-127, 127, (K, N)), jnp.int8)

        def one(x):
            acc = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # loop-carried dependence: next input derives from acc
            return (acc[:, :K] & 0x7F).astype(jnp.int8)
    else:
        x0 = jnp.asarray(
            np.random.RandomState(0).randn(M, K) * 0.1, jnp.bfloat16)
        w = jnp.asarray(
            np.random.RandomState(1).randn(K, N) * 0.1, jnp.bfloat16)

        def one(x):
            acc = x @ w
            return jnp.tanh(acc[:, :K])

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, k):
        def body(c, _):
            return one(c), ()

        c, _ = jax.lax.scan(body, x, None, length=k)
        return c.astype(jnp.float32).mean()

    def t(k):
        float(chain(x0, k))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(chain(x0, k))
            best = min(best, time.time() - t0)
        return best

    K_SMALL, K_BIG = 8, 64
    per = (t(K_BIG) - t(K_SMALL)) / (K_BIG - K_SMALL)
    ops = 2.0 * M * K * N
    return ops / per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/xlxmert_roofline"))
    print("devices:", jax.devices())

    rows = []
    tot_ops = {"int8": 0.0, "bf16": 0.0}
    tot_time = {"int8": 0.0, "bf16": 0.0}
    for name, M, K, N, wgt in SHAPES:
        rec = {"shape": name}
        for dt in ("int8", "bf16"):
            rate = measure_shape(M, K, N, dt, args.reps)
            rec[dt] = rate
            ops = 2.0 * M * K * N * wgt
            tot_ops[dt] += ops
            tot_time[dt] += ops / rate
            print(f"{name:34s} {dt}: {rate/1e12:7.1f} TOP/s", flush=True)
        rows.append(rec)

    mix = {dt: tot_ops[dt] / tot_time[dt] for dt in ("int8", "bf16")}
    print(json.dumps({
        "flop_weighted_mix_int8_tops": round(mix["int8"] / 1e12, 1),
        "flop_weighted_mix_bf16_tops": round(mix["bf16"] / 1e12, 1),
        "int8_vs_bf16": round(mix["int8"] / mix["bf16"], 2),
        "shapes": [{k: (round(v / 1e12, 1) if isinstance(v, float) else v)
                    for k, v in r.items()} for r in rows],
    }))


if __name__ == "__main__":
    main()
