"""TPU measurement of the round-4 VQA serving levers (CEILING.md §1):

  1. int8 attention score/context einsums (serving/lxmert_int8.
     int8_attention) vs the bf16-attention int8 baseline;
  2. length-bucketed serving: engine q/s at L in {8,12,16,20} —
     the per-bucket device rate that cli/serve --buckets routes into.

Same timing discipline as bench.py (chained lax.scan with a
data-dependent carry, two chain lengths differenced — block_until_ready
is unreliable through the axon tunnel).

Run on the chip:  python scripts/drive_vqa_levers.py [--batch 256]
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lengths", default="8,12,16,20")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.models.lxmert import (LxmertModel, VisualAnswerHead,
                                           serving_mode)
    from xlxmert_tpu.serving import lxmert_int8 as engine
    from xlxmert_tpu.utils.boxes import box_position

    cfg = LxmertConfig()
    serving_mode(True)
    print("devices:", jax.devices())
    B, V = args.batch, 64
    K_SMALL, K_BIG = 4, 36
    L_MAX = 20

    model = LxmertModel(cfg, dtype=jnp.bfloat16)
    head = VisualAnswerHead(cfg, num_labels=3129, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.jit(lambda r: model.init(
            r, jnp.ones((8, L_MAX), jnp.int32),
            jnp.zeros((8, V, cfg.visual_feat_dim), jnp.bfloat16),
            jnp.zeros((8, V, 4)),
            attention_mask=jnp.ones((8, L_MAX)))["params"])(rng)
        head_params = head.init(rng, jnp.zeros((8, cfg.hidden_size)))["params"]

    qp = engine.prepare_params(jax.tree.map(np.asarray, params), cfg)
    hqp = engine.prepare_answer_head(jax.tree.map(np.asarray, head_params))
    Bc = 8
    pos_c = jnp.broadcast_to(jnp.asarray(box_position(8))[None], (Bc, V, 4)
                             ).astype(jnp.bfloat16)
    calib = engine.calibrate(
        qp, hqp,
        [(jnp.ones((Bc, L_MAX), jnp.int32),
          jax.random.normal(rng, (Bc, V, cfg.visual_feat_dim)) * 0.1,
          pos_c, jnp.ones((Bc, L_MAX)))], cfg)
    sqp = engine.apply_calibration(qp, calib)
    shqp = engine.apply_calibration(hqp, calib)
    engine.assert_fully_calibrated(sqp, shqp)

    make_stack = jax.jit(
        lambda k, B: jax.random.normal(
            jax.random.PRNGKey(1), (k, B, V, cfg.visual_feat_dim),
            jnp.bfloat16) * 0.1, static_argnums=(0, 1))

    def qps_at(L, tag):
        ids = jnp.ones((B, L), jnp.int32)
        mask = jnp.ones((B, L), jnp.float32)
        pos = jnp.broadcast_to(jnp.asarray(box_position(8))[None],
                               (B, V, 4)).astype(jnp.bfloat16)

        @jax.jit
        def run(sqp, shqp, ids, pos, mask, stacked, seed):
            def body(carry, f):
                _, _, pooled = engine.lxmert_forward(
                    sqp, ids, f + carry * 1e-6, pos, attention_mask=mask,
                    n_heads=cfg.num_attention_heads)
                logits = engine.answer_head_forward(shqp, pooled)
                return carry + logits.mean().astype(jnp.bfloat16), ()

            c, _ = jax.lax.scan(body, seed, stacked)
            return c

        def t(k):
            stacked = make_stack(k, B)
            float(run(sqp, shqp, ids, pos, mask, stacked, jnp.bfloat16(0)))
            best = float("inf")
            for r in range(args.reps):
                t0 = time.time()
                float(run(sqp, shqp, ids, pos, mask, stacked,
                          jnp.bfloat16(r)))
                best = min(best, time.time() - t0)
            return best

        per = (t(K_BIG) - t(K_SMALL)) / (K_BIG - K_SMALL)
        q = B / per
        print(f"{tag:28s} {q:9.1f} q/s", flush=True)
        return q

    out = {}
    out["baseline_L20"] = qps_at(L_MAX, "int8 baseline L=20")

    engine.int8_attention(True)
    try:
        out["int8_attention_L20"] = qps_at(L_MAX, "int8 attention L=20")
    finally:
        engine.int8_attention(False)

    for L in sorted({int(x) for x in args.lengths.split(",")}):
        out[f"bucket_L{L}"] = qps_at(L, f"bucket L={L}")

    # a stream with the VQA length distribution (~80% of questions fit
    # L<=12): effective q/s if routed by cli/serve --buckets. Traffic
    # for an unmeasured mix length is routed to the smallest measured
    # bucket that holds it (cli/serve semantics: the largest bucket
    # always covers L_MAX) so a partial --lengths sweep can't inflate
    # the effective rate.
    from xlxmert_tpu.serving.lxmert_int8 import VQA_LENGTH_MIX
    measured = sorted(L for L in VQA_LENGTH_MIX if f"bucket_L{L}" in out)
    if measured:
        if L_MAX not in measured:
            out[f"bucket_L{L_MAX}"] = out["baseline_L20"]
            measured.append(L_MAX)
        t_eff = 0.0
        for L, frac in VQA_LENGTH_MIX.items():
            Lb = next(b for b in measured if b >= L)
            t_eff += frac / out[f"bucket_L{Lb}"]
        out["bucketed_mix_qps"] = 1.0 / t_eff
    else:
        out["bucketed_mix_qps"] = None
    print(json.dumps({k: (round(v, 1) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
