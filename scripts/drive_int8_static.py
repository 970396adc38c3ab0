"""Measure the static-calibrated int8 serving path vs bf16 at production
shapes on the real TPU (bench.py differencing method: K dependent
forwards in one scan, fetch one scalar, difference two K values)."""
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.models.lxmert import LxmertModel, VisualAnswerHead, serving_mode
    from xlxmert_tpu.serving import lxmert_int8 as engine
    from xlxmert_tpu.utils.boxes import box_position

    serving_mode(True)
    cfg = LxmertConfig()
    B, L, V = 256, 20, 64
    K_SMALL, K_BIG = 4, 20

    model = LxmertModel(cfg, dtype=jnp.bfloat16)
    head = VisualAnswerHead(cfg, num_labels=3129, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)
    feats = jax.random.normal(rng, (B, V, cfg.visual_feat_dim),
                              jnp.bfloat16) * 0.1
    pos = jnp.broadcast_to(jnp.asarray(box_position(8))[None],
                           (B, V, 4)).astype(jnp.bfloat16)
    t0 = time.time()
    params = jax.jit(lambda r: model.init(
        r, ids, feats, pos, attention_mask=mask)["params"])(rng)
    head_params = head.init(rng, jnp.zeros((B, cfg.hidden_size)))["params"]
    print(f"init {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    params_f32 = jax.tree.map(np.asarray, params)
    qp = engine.prepare_params(params_f32, cfg)
    hqp = engine.prepare_answer_head(jax.tree.map(np.asarray, head_params))
    print(f"quantize {time.time()-t0:.0f}s", flush=True)

    # calibrate on one small batch (eager) — small B to keep it quick
    t0 = time.time()
    Bc = 8
    calib_batch = (ids[:Bc], feats[:Bc].astype(jnp.float32), pos[:Bc],
                   mask[:Bc])
    calib = engine.calibrate(qp, hqp, [calib_batch], cfg)
    sqp = engine.apply_calibration(qp, calib)
    shqp = engine.apply_calibration(hqp, calib)
    print(f"calibrated {len(calib)} sites {time.time()-t0:.0f}s", flush=True)

    def timed(run_fn, args, k_small, k_big, reps=3):
        def t(k, stacked):
            float(run_fn(*args, stacked, jnp.bfloat16(0.0)))
            best = float("inf")
            for r in range(reps):
                t0 = time.time()
                float(run_fn(*args, stacked, jnp.bfloat16(r)))
                best = min(best, time.time() - t0)
            return best
        mk = jax.jit(lambda k: jax.random.normal(
            jax.random.PRNGKey(1), (k, B, V, cfg.visual_feat_dim),
            jnp.bfloat16) * 0.1, static_argnums=0)
        ts = t(k_small, mk(k_small))
        tb = t(k_big, mk(k_big))
        per = (tb - ts) / (k_big - k_small)
        return B / per

    @jax.jit
    def run_int8(qp, hqp, ids, pos, mask, stacked, seed):
        def body(carry, f):
            _, _, pooled = engine.lxmert_forward(
                qp, ids, f + carry * 1e-6, pos, attention_mask=mask,
                n_heads=cfg.num_attention_heads)
            logits = engine.answer_head_forward(hqp, pooled)
            return carry + logits.mean().astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, seed, stacked)
        return c

    @jax.jit
    def run_bf16(params, head_params, ids, pos, mask, stacked, seed):
        def body(carry, f):
            _, _, pooled = model.apply(
                {"params": params}, ids, f + carry * 1e-6, pos,
                attention_mask=mask, deterministic=True)
            logits = head.apply({"params": head_params}, pooled)
            return carry + logits.mean().astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, seed, stacked)
        return c

    bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    bf16_head = jax.tree.map(lambda x: x.astype(jnp.bfloat16), head_params)

    qps_bf16 = timed(run_bf16, (bf16_params, bf16_head, ids, pos, mask),
                     K_SMALL, K_BIG)
    print(f"bf16 serving: {qps_bf16:.0f} q/s", flush=True)

    qps_static = timed(run_int8, (sqp, shqp, ids, pos, mask),
                       K_SMALL, K_BIG)
    print(f"int8 static: {qps_static:.0f} q/s "
          f"({qps_static/qps_bf16:.2f}x bf16)", flush=True)

    qps_dyn = timed(run_int8, (qp, hqp, ids, pos, mask), K_SMALL, K_BIG)
    print(f"int8 dynamic: {qps_dyn:.0f} q/s "
          f"({qps_dyn/qps_bf16:.2f}x bf16)", flush=True)


if __name__ == "__main__":
    main()
