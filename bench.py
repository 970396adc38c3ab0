"""Headline benchmark: batched VQA inference throughput (queries/sec/chip).

Matches BASELINE.json config #1 (VQA inference from pre-extracted 8x8 grid
features). Runs on the real TPU chip via the default platform.

Measurement method: the axon tunnel makes `block_until_ready` unreliable
(dispatch returns early), so we chain K forwards inside a single jitted
`lax.scan` over K distinct input batches with a data-dependent carry, fetch
one scalar to the host, and difference two K values to cancel the constant
tunnel/dispatch overhead.

Baseline: the reference publishes no numbers (BASELINE.md); the A100 anchor
below is the estimated throughput of the reference PyTorch stack (eager
fp16 LXMERT-base VQA forward, ~15 GFLOP/sample at 15-25% utilization on a
312-TFLOP/s A100 => ~3-5k q/s). We use 4000 q/s; vs_baseline = ours/4000.
The north-star target is vs_baseline >= 5.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_BASELINE_QPS = 4000.0


def main():
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.models.lxmert import LxmertModel, VisualAnswerHead
    from xlxmert_tpu.utils.boxes import box_position

    from xlxmert_tpu.models.lxmert import serving_mode

    serving_mode(True)  # bf16 softmax + tanh gelu (xla attention — measured
    # faster than the pallas kernel at these shapes, see ops/attention.py)

    cfg = LxmertConfig()
    B, L, V = 256, 20, 64
    K_SMALL, K_BIG = 4, 36

    model = LxmertModel(cfg, dtype=jnp.bfloat16)
    head = VisualAnswerHead(cfg, num_labels=3129, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)
    feats1 = jax.random.normal(rng, (B, V, cfg.visual_feat_dim),
                               jnp.bfloat16) * 0.1
    pos = jnp.broadcast_to(jnp.asarray(box_position(8))[None],
                           (B, V, 4)).astype(jnp.bfloat16)
    params = jax.jit(lambda r: model.init(
        r, ids, feats1, pos, attention_mask=mask)["params"])(rng)
    head_params = head.init(rng, jnp.zeros((B, cfg.hidden_size)))["params"]
    # Serve weights in bf16: halves HBM traffic for the bandwidth-bound parts.
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    head_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), head_params)

    # NB: all arrays are explicit jit arguments — closure-captured device
    # arrays are embedded into the HLO, and the axon tunnel's
    # /remote_compile POST rejects >~100MB bodies (HTTP 413).
    @jax.jit
    def run(params, head_params, ids, pos, mask, stacked, seed):
        def body(carry, f):
            # data-dependent perturbation defeats CSE across iterations
            _, _, pooled = model.apply(
                {"params": params}, ids, f + carry * 1e-6, pos,
                attention_mask=mask, deterministic=True)
            logits = head.apply({"params": head_params}, pooled)
            return carry + logits.mean().astype(jnp.bfloat16), ()

        c, _ = jax.lax.scan(body, seed, stacked)
        return c

    make_stack = jax.jit(
        lambda k: jax.random.normal(
            jax.random.PRNGKey(1), (k, B, V, cfg.visual_feat_dim),
            jnp.bfloat16) * 0.1,
        static_argnums=0)

    def timed(k, reps=3):
        stacked = make_stack(k)
        float(run(params, head_params, ids, pos, mask, stacked,
                  jnp.bfloat16(0.0)))  # compile+warm
        best = float("inf")
        for r in range(reps):
            t0 = time.time()
            # host fetch forces completion
            float(run(params, head_params, ids, pos, mask, stacked,
                      jnp.bfloat16(r)))
            best = min(best, time.time() - t0)
        return best

    t_small = timed(K_SMALL)
    t_big = timed(K_BIG)
    per_batch = (t_big - t_small) / (K_BIG - K_SMALL)
    qps = B / per_batch

    print(json.dumps({
        "metric": "vqa_queries_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / A100_BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
