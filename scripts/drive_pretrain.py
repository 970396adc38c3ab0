"""Drive the pretraining engine end-to-end: full-size model, synthetic
batches, all three round-robin tasks, on the default platform (TPU).

Usage: python scripts/drive_pretrain.py [--batch 32] [--steps 6] [--tiny] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=32)
parser.add_argument("--steps", type=int, default=6)
parser.add_argument("--tiny", action="store_true")
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--chain", type=int, default=0,
                    help="also measure K chained steps per task in one "
                    "jit (true device rate; cancels tunnel round-trip)")
parser.add_argument("--no_dropout", action="store_true",
                    help="ablation: zero dropout rates (flax short-"
                    "circuits, no RNG bits generated) to isolate the "
                    "PRNG + mask cost in the train step")
parser.add_argument("--rng_impl", default=None,
                    help="ablation: jax_default_prng_impl (e.g. rbg)")
parser.add_argument("--train_attention", default="xla",
                    choices=["xla", "pallas_blhd", "auto"],
                    help="training-path attention impl "
                    "(models/lxmert.train_attention_mode): pallas_blhd = "
                    "BL(HD) layout-native Pallas fwd + einsum-recompute "
                    "bwd, dropout mask as a kernel operand. MEASURED "
                    "verdict (this rig, --attrib 8): fwd 68.8 vs 66.0 ms, "
                    "bwd 158.2 vs 103.4 - xla wins, lever closed "
                    "(docs/CEILING.md s3)")
parser.add_argument("--attrib", type=int, default=0, metavar="K",
                    help="step-time attribution: time K-chained variants "
                    "of the vis_mask step — forward-only, forward+grad "
                    "(no update), full step — to decompose fwd/bwd/"
                    "optimizer cost (docs/CEILING.md training section)")
args = parser.parse_args()

import jax

if args.rng_impl:
    jax.config.update("jax_default_prng_impl", args.rng_impl)

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from xlxmert_tpu.core.config import LxmertConfig, TrainConfig
from xlxmert_tpu.models.lxmert import train_attention_mode
from xlxmert_tpu.tasks.pretrain import PretrainEngine

print("devices:", jax.devices())
print("train_attention:", train_attention_mode(args.train_attention))

if args.tiny:
    model_cfg = LxmertConfig(vocab_size=1000, hidden_size=64,
                             num_attention_heads=4, intermediate_size=128,
                             l_layers=2, x_layers=1, r_layers=1,
                             visual_feat_dim=64, num_clusters=100)
    cfg = TrainConfig(batch_size=args.batch, num_clusters=100,
                      mixed_precision=False)
else:
    model_cfg = LxmertConfig()
    cfg = TrainConfig(batch_size=args.batch)

if args.no_dropout:
    import dataclasses

    model_cfg = dataclasses.replace(
        model_cfg, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)

eng = PretrainEngine(cfg, model_cfg=model_cfg, total_steps=1000)
t0 = time.time()
state = eng.create_state(jax.random.PRNGKey(0))
print(f"init {time.time()-t0:.1f}s; params:",
      sum(x.size for x in jax.tree.leaves(state.params)))

rng = jax.random.PRNGKey(1)
centroids = jnp.asarray(
    np.random.RandomState(0).randn(model_cfg.num_clusters,
                                   model_cfg.visual_feat_dim)
    .astype(np.float32) * 0.05)

B, L, V = cfg.batch_size, cfg.max_text_length, cfg.n_grids
host_rng = np.random.RandomState(2)
batch = eng.place({
    "word_id": np.concatenate([
        np.full((B, 1), 101, np.int32),
        host_rng.randint(1, model_cfg.vocab_size, (B, L - 1)).astype(np.int32)],
        axis=1),
    "other_word_id": host_rng.randint(
        1, model_cfg.vocab_size, (B, L)).astype(np.int32),
    "matched_label": host_rng.randint(0, 2, (B,)).astype(np.int32),
    "cluster_id": host_rng.randint(0, model_cfg.num_clusters, (B, V)).astype(np.int32),
})

for i in range(args.steps):
    task = eng.task_for_step(i)
    t0 = time.time()
    state, metrics = eng.train_step(task)(state, batch, rng, centroids)
    loss = float(np.asarray(metrics["total_loss"]))  # forces completion
    print(f"step {i} task={task:<9} loss={loss:.4f} "
          f"grad_norm={float(np.asarray(metrics['grad_norm'])):.3f} "
          f"({time.time()-t0:.1f}s)")

print("final step count:", int(np.asarray(state.step)))

if args.chain:
    K = args.chain
    for task in cfg.mask_modalities:
        fn = eng.chained_train_step(task, K)
        state, loss = fn(state, batch, rng, centroids)  # compile+warm
        float(np.asarray(loss))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            state, loss = fn(state, batch, rng, centroids)
            float(np.asarray(loss))
            best = min(best, time.time() - t0)
        per_step = best / K
        print(f"chained x{K} task={task:<9} {per_step*1e3:7.1f} ms/step "
              f"{cfg.batch_size/per_step:8.1f} ex/s/chip")

if args.attrib:
    # Decompose the train step: time K-chained variants that share the
    # batch + rng discipline of chained_train_step (fold by a step
    # counter; loss accumulates as the scan carry so iterations are
    # dependent; one fetch per measurement — tunnel-honest timing).
    import optax

    K = args.attrib
    task = "vis_mask"
    lf = eng.loss_fn(task)
    params = state.params
    opt_state = state.opt_state

    def timed(fn, *fn_args):
        out = fn(*fn_args)  # compile + warm
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn(*fn_args)
            float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
            best = min(best, time.time() - t0)
        return best / K

    @jax.jit
    def fwd_only(params, batch, rng, centroids):
        def body(acc, i):
            r = jax.random.fold_in(rng, i)
            loss, _ = lf(params, batch, r, centroids, False)
            return acc + loss, None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(K))
        return acc

    @jax.jit
    def fwd_bwd(params, batch, rng, centroids):
        def body(acc, i):
            r = jax.random.fold_in(rng, i)
            (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(
                params, batch, r, centroids, False)
            gn = optax.global_norm(grads)
            return acc + loss + gn * 1e-30, None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(K))
        return acc

    @jax.jit
    def full(state, batch, rng, centroids):
        def body(s, i):
            s2, m = eng._raw_train_steps[task](s, batch, rng, centroids)
            return s2, m["total_loss"]
        s, losses = jax.lax.scan(body, state, jnp.arange(K))
        return losses.mean()

    t_fwd = timed(fwd_only, params, batch, rng, centroids)
    t_fb = timed(fwd_bwd, params, batch, rng, centroids)
    t_full = timed(full, state, batch, rng, centroids)
    B = cfg.batch_size
    print(f"attrib (task={task}, B={B}, K={K}):")
    print(f"  forward only        {t_fwd*1e3:7.1f} ms/step "
          f"({B/t_fwd:8.1f} ex/s)")
    print(f"  forward+grad        {t_fb*1e3:7.1f} ms/step "
          f"({B/t_fb:8.1f} ex/s)  bwd = {1e3*(t_fb-t_fwd):.1f} ms")
    print(f"  full step (+optim)  {t_full*1e3:7.1f} ms/step "
          f"({B/t_full:8.1f} ex/s)  optim = {1e3*(t_full-t_fb):.1f} ms")

print("OK")
