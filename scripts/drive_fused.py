"""Measure the whole-block fused int8 serving path on the real TPU.

Compares, at B=256 production VQA shapes:
  - static-calibrated int8 XLA path (current champion, ~9.9k q/s)
  - whole-block fused Pallas path (serving/lxmert_fused.py)
with a block_rows sweep. Timing via the scan-chain method (see bench.py:
the axon tunnel makes block_until_ready unreliable, so K dependent
iterations run inside one jit and two K values are differenced).

Usage: python scripts/drive_fused.py [--batch 256] [--rows 128,256,512]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--rows", default="128,256,512")
    ap.add_argument("--skip_static", action="store_true")
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.models.lxmert import LxmertModel, VisualAnswerHead, serving_mode
    from xlxmert_tpu.serving import lxmert_int8 as engine
    from xlxmert_tpu.serving.lxmert_fused import lxmert_forward_fused, prepare_fused
    from xlxmert_tpu.utils.boxes import box_position

    print("devices:", jax.devices())
    cfg = LxmertConfig()
    serving_mode(True)
    B, L, V = ns.batch, 20, 64
    K_SMALL, K_BIG = 4, 36

    model = LxmertModel(cfg, dtype=jnp.bfloat16)
    head = VisualAnswerHead(cfg, num_labels=3129, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)
    feats = jax.random.normal(rng, (B, V, cfg.visual_feat_dim),
                              jnp.bfloat16) * 0.1
    pos = jnp.broadcast_to(jnp.asarray(box_position(8))[None],
                           (B, V, 4)).astype(jnp.bfloat16)
    params = jax.jit(lambda r: model.init(
        r, ids, feats, pos, attention_mask=mask)["params"])(rng)
    head_params = head.init(rng, jnp.zeros((B, cfg.hidden_size)))["params"]

    qp = engine.prepare_params(jax.tree.map(np.asarray, params), cfg)
    hqp = engine.prepare_answer_head(jax.tree.map(np.asarray, head_params))
    Bc = 8
    calib = engine.calibrate(
        qp, hqp,
        [(ids[:Bc], feats[:Bc].astype(jnp.float32), pos[:Bc], mask[:Bc])],
        cfg)
    sqp = engine.apply_calibration(qp, calib)
    shqp = engine.apply_calibration(hqp, calib)
    fp = prepare_fused(sqp, cfg)

    make_stack = jax.jit(
        lambda k: jax.random.normal(
            jax.random.PRNGKey(1), (k, B, V, cfg.visual_feat_dim),
            jnp.bfloat16) * 0.1,
        static_argnums=0)

    def timed(run, args, reps=3):
        def t(k):
            stacked = make_stack(k)
            float(run(*args, stacked, jnp.bfloat16(0.0)))
            best = float("inf")
            for r in range(reps):
                t0 = time.time()
                float(run(*args, stacked, jnp.bfloat16(r)))
                best = min(best, time.time() - t0)
            return best

        per_batch = (t(K_BIG) - t(K_SMALL)) / (K_BIG - K_SMALL)
        return B / per_batch

    if not ns.skip_static:
        @jax.jit
        def run_static(sqp, shqp, ids, pos, mask, stacked, seed):
            def body(carry, f):
                _, _, pooled = engine.lxmert_forward(
                    sqp, ids, f + carry * 1e-6, pos, attention_mask=mask,
                    n_heads=cfg.num_attention_heads)
                logits = engine.answer_head_forward(shqp, pooled)
                return carry + logits.mean().astype(jnp.bfloat16), ()

            c, _ = jax.lax.scan(body, seed, stacked)
            return c

        qps = timed(run_static, (sqp, shqp, ids, pos, mask))
        print(f"int8 static XLA path : {qps:8.1f} q/s")

    row_list = ([] if ns.rows.lower() in ("", "none")
                else [int(r) for r in ns.rows.split(",")])
    for rows in row_list:
        def mk(rows):
            @jax.jit
            def run_fused(fp, shqp, ids, pos, mask, stacked, seed):
                def body(carry, f):
                    _, _, pooled = lxmert_forward_fused(
                        fp, ids, f + carry * 1e-6, pos,
                        attention_mask=mask,
                        n_heads=cfg.num_attention_heads, block_rows=rows)
                    logits = engine.answer_head_forward(shqp, pooled)
                    return carry + logits.mean().astype(jnp.bfloat16), ()

                c, _ = jax.lax.scan(body, seed, stacked)
                return c

            return run_fused

        try:
            qps = timed(mk(rows), (fp, shqp, ids, pos, mask))
            print(f"fused  block_rows={rows:4d}: {qps:8.1f} q/s")
        except Exception as e:  # noqa: BLE001 — sweep must continue
            print(f"fused  block_rows={rows:4d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
