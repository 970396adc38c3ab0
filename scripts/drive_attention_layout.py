"""Measure attention-core layout variants in the int8 serving engine
(round-5 lever from scripts/drive_serving_trace.py: ~30 us/sample of the
102 us/sample device time is (B,L,H,D)<->(B,H,L,D) transpose copies
around the bhqk einsums — serving/lxmert_int8.py:229-231).

Variants:
  base     stock bhqk einsum pair (XLA inserts the transposes)
  bqhk     reordered einsums (bqhk scores) — tests whether XLA merely
           moves the copies
  pallasN  ops/attention.mha_blhd: BL(HD)-native fused kernel, no HBM
           head transpose, batch block N (any N: pallas8/16/32/...;
           round-5 sweep: 16=12,600, 32=12,970 q/s, 64=VMEM OOM)

Each variant is timed with the bench-standard K-dependent-forwards-in-
one-scan rig (tunnel-proof). A small-batch numerics check pins each
variant against base first.

  python scripts/drive_attention_layout.py --variants base,pallas16
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=256)
parser.add_argument("--scan_k", type=int, default=20)
parser.add_argument("--repeats", type=int, default=3)
parser.add_argument("--variants", default="base,bqhk,pallas16,pallas8")
parser.add_argument("--bf16", action="store_true",
                    help="measure the bf16 flax-model path instead: "
                         "serving_mode attention xla vs pallas_blhd")
parser.add_argument("--text_len", type=int, default=20,
                    help="question length (bucketed-serving shapes)")
args = parser.parse_args()


def main_bf16():
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.models.lxmert import (LxmertModel, VisualAnswerHead,
                                           serving_mode)
    from xlxmert_tpu.utils.boxes import box_position

    cfg = LxmertConfig()
    B, L, V = args.batch, args.text_len, 64
    K = args.scan_k
    serving_mode(True)
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
    bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    bf16_head = jax.tree.map(lambda x: x.astype(jnp.bfloat16), head_params)
    print(f"init {time.time()-t0:.0f}s", flush=True)
    stacked = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (K, B, V, cfg.visual_feat_dim),
        jnp.bfloat16) * 0.1)()

    for attn in ("xla", "pallas_blhd"):
        serving_mode(True, attention=attn)

        @jax.jit
        def run(mp, hp, ids, pos, mask, stacked, seed):
            # params are ARGUMENTS, not closure constants: a closed-over
            # 400 MB bf16 tree ships in the remote-compile request body
            # and trips the tunnel's HTTP 413 limit
            def body(carry, f):
                _, _, pooled = model.apply(
                    {"params": mp}, ids, f + carry * 1e-6, pos,
                    attention_mask=mask, deterministic=True)
                logits = head.apply({"params": hp}, pooled)
                return carry + logits.mean().astype(jnp.bfloat16), ()
            c, _ = jax.lax.scan(body, seed, stacked)
            return c

        float(run(bf16_params, bf16_head, ids, pos, mask, stacked,
                  jnp.bfloat16(0.0)))
        best = 0.0
        for r in range(args.repeats):
            t0 = time.time()
            float(run(bf16_params, bf16_head, ids, pos, mask, stacked,
                      jnp.bfloat16(r + 1.0)))
            best = max(best, B * K / (time.time() - t0))
        print(f"[bf16/{attn}] {best:.0f} q/s (best of {args.repeats}, "
              f"K={K}, B={B}, L={L})", flush=True)
    serving_mode(True)


def main():
    if args.bf16:
        return main_bf16()
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.models.lxmert import (LxmertModel, VisualAnswerHead,
                                           serving_mode)
    from xlxmert_tpu.ops.attention import mha_blhd
    from xlxmert_tpu.serving import lxmert_int8 as engine
    from xlxmert_tpu.utils.boxes import box_position

    serving_mode(True)
    cfg = LxmertConfig()
    B, L, V = args.batch, args.text_len, 64
    K = args.scan_k

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

    params_f32 = jax.tree.map(np.asarray, params)
    qp = engine.prepare_params(params_f32, cfg)
    hqp = engine.prepare_answer_head(jax.tree.map(np.asarray, head_params))
    Bc = 8
    calib_batch = (ids[:Bc], feats[:Bc].astype(jnp.float32), pos[:Bc],
                   mask[:Bc])
    calib = engine.calibrate(qp, hqp, [calib_batch], cfg)
    sqp = engine.apply_calibration(qp, calib)
    shqp = engine.apply_calibration(hqp, calib)
    print(f"calibrated {len(calib)} sites", flush=True)

    # --- attention-core variants -----------------------------------------
    def core_bqhk(q, k, v, bias, n_heads):
        Bq, Lq, Hd = q.shape
        Lk = k.shape[1]
        D = Hd // n_heads
        q = q.reshape(Bq, Lq, n_heads, D)
        k = k.reshape(Bq, Lk, n_heads, D)
        v = v.reshape(Bq, Lk, n_heads, D)
        s = jnp.einsum("bqhd,bkhd->bqhk", q, k,
                       preferred_element_type=jnp.bfloat16)
        s = s * jnp.bfloat16(1.0 / np.sqrt(D))
        if bias is not None:
            s = s + bias  # (B,1,1,Lk) broadcasts over (B,Lq,H,Lk) too
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        ctx = jnp.einsum("bqhk,bkhd->bqhd", p, v)
        return ctx.reshape(Bq, Lq, Hd)

    def core_pallas(block):
        def core(q, k, v, bias, n_heads):
            return mha_blhd(q, k, v, bias, n_heads, fast=True,
                            block_b=block)
        return core

    def core_hbatch(block):
        # EXPERIMENT: replace the kernel's 12 sequential per-head dots
        # with ONE two-batch-dim dot_general over (BB, H) plus an
        # in-VMEM head transpose on the context. Tests whether Mosaic
        # schedules the batched contraction better than the unrolled
        # head loop (the loop runs ~0.68 us/call = ~13 us/sample).
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads,
                 scale):
            BB, Lq, HD = q_ref.shape
            Lk = k_ref.shape[1]
            D = HD // n_heads
            q = q_ref[...].reshape(BB, Lq, n_heads, D)
            k = k_ref[...].reshape(BB, Lk, n_heads, D)
            v = v_ref[...].reshape(BB, Lk, n_heads, D)
            s = jax.lax.dot_general(
                q, k, (((3,), (3,)), ((0, 2), (0, 2))),
                preferred_element_type=jnp.float32)  # (BB,H,Lq,Lk)
            s = (s * scale).astype(q.dtype)
            s = s + bias_ref[:, 0, :][:, None, None, :].astype(q.dtype)
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            ctx = jax.lax.dot_general(
                p, v, (((3,), (1,)), ((0, 1), (0, 2))),
                preferred_element_type=jnp.float32)  # (BB,H,Lq,D)
            o_ref[...] = ctx.transpose(0, 2, 1, 3).reshape(
                BB, Lq, HD).astype(o_ref.dtype)

        def core(q, k, v, bias, n_heads):
            Bq, Lq, HD = q.shape
            Lk = k.shape[1]
            D = HD // n_heads
            BB = min(block, Bq)
            while Bq % BB:
                BB //= 2
            return pl.pallas_call(
                functools.partial(kern, n_heads=n_heads,
                                  scale=float(1.0 / np.sqrt(D))),
                out_shape=jax.ShapeDtypeStruct((Bq, Lq, HD), q.dtype),
                grid=(Bq // BB,),
                in_specs=[
                    pl.BlockSpec((BB, Lq, HD), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BB, Lk, HD), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BB, Lk, HD), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BB, 1, Lk), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BB, Lq, HD), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
                interpret=jax.devices()[0].platform == "cpu",
            )(q, k, v, bias.reshape(Bq, 1, Lk))

        return core

    dispatcher = engine._attention_core

    def core_einsum(q, k, v, bias, n_heads):
        # the engine dispatcher defaults to the Pallas kernel on TPU
        # since round 5; force its einsum branch for the baseline
        prev = engine._ATTENTION_IMPL
        engine._ATTENTION_IMPL = "einsum"
        try:
            return dispatcher(q, k, v, bias, n_heads)
        finally:
            engine._ATTENTION_IMPL = prev

    variants = {
        "base": core_einsum,
        "bqhk": core_bqhk,
    }
    for name in args.variants.split(","):
        if name.startswith("pallas"):
            variants[name] = core_pallas(int(name[len("pallas"):]))
        elif name.startswith("hbatch"):
            variants[name] = core_hbatch(int(name[len("hbatch"):]))

    stacked = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (K, B, V, cfg.visual_feat_dim),
        jnp.bfloat16) * 0.1)()

    def make_run():
        @jax.jit
        def run(ids, pos, mask, stacked, seed):
            def body(carry, f):
                _, _, pooled = engine.lxmert_forward(
                    sqp, ids, f + carry * 1e-6, pos, attention_mask=mask,
                    n_heads=cfg.num_attention_heads)
                logits = engine.answer_head_forward(shqp, pooled)
                return carry + logits.mean().astype(jnp.bfloat16), ()
            c, _ = jax.lax.scan(body, seed, stacked)
            return c

        @jax.jit
        def logits_once(ids, pos, mask, feats):
            _, _, pooled = engine.lxmert_forward(
                sqp, ids, feats, pos, attention_mask=mask,
                n_heads=cfg.num_attention_heads)
            return engine.answer_head_forward(shqp, pooled)
        return run, logits_once

    base_core = engine._attention_core
    ref_logits = None
    results = {}
    for name in args.variants.split(","):
        name = name.strip()
        engine._attention_core = variants[name]
        try:
            run, logits_once = make_run()
            t0 = time.time()
            lg = np.asarray(logits_once(ids, pos, mask, feats))
            if ref_logits is None:
                ref_logits = lg
                dev = 0.0
            else:
                dev = float(np.abs(lg - ref_logits).max())
            agree = (None if ref_logits is lg else float(
                (lg.argmax(-1) == ref_logits.argmax(-1)).mean()))
            print(f"[{name}] logits compile+check {time.time()-t0:.0f}s "
                  f"max|d|={dev:.4f} argmax-agree={agree}", flush=True)
            float(run(ids, pos, mask, stacked, jnp.bfloat16(0.0)))  # compile
            best = 0.0
            for r in range(args.repeats):
                t0 = time.time()
                float(run(ids, pos, mask, stacked, jnp.bfloat16(r + 1.0)))
                qps = B * K / (time.time() - t0)
                best = max(best, qps)
            print(f"[{name}] {best:.0f} q/s (best of {args.repeats}, "
                  f"K={K}, B={B}, incl. ~55ms round-trip)", flush=True)
            results[name] = best
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)
        finally:
            engine._attention_core = base_core

    print("\n== summary ==")
    for name, qps in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {name:<10} {qps:8.0f} q/s")


if __name__ == "__main__":
    main()
