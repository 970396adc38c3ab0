"""Full-size pretraining convergence smoke on TPU: 300 steps at B=256 on
a fixed 8-batch synthetic set — all task losses must trend down
(memorization). Run on the chip; ~5 min warm-cache.

Observed (2026-08-16, random-token data): vis_mask 10.01 -> 9.21,
word_mask 10.47 -> 10.14, matched flat at ln2 (labels are random coins —
chance is correct).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from xlxmert_tpu.core.config import LxmertConfig, TrainConfig
from xlxmert_tpu.tasks.pretrain import PretrainEngine

model_cfg = LxmertConfig()
cfg = TrainConfig(batch_size=256, lr=5e-5)
eng = PretrainEngine(cfg, model_cfg=model_cfg, total_steps=400)
state = eng.create_state(jax.random.PRNGKey(0))
rng = jax.random.PRNGKey(1)
centroids = jnp.asarray(np.random.RandomState(0).randn(10000, 2048).astype(np.float32) * 0.05)
host = np.random.RandomState(2)
B, L, V = 256, 20, 64
# small fixed dataset (8 batches) -> model should memorize
batches = []
for i in range(8):
    word_id = np.concatenate([np.full((B,1), 101, np.int32),
        host.randint(1, 30522, (B, L-1)).astype(np.int32)], 1)
    batches.append(eng.place({
        "word_id": word_id,
        "other_word_id": host.randint(1, 30522, (B, L)).astype(np.int32),
        "matched_label": host.randint(0, 2, (B,)).astype(np.int32),
        "cluster_id": host.randint(0, 10000, (B, V)).astype(np.int32),
    }))
first, last = {}, {}
t0 = time.time()
for step in range(300):
    task = eng.task_for_step(step)
    state, m = eng.train_step(task)(state, batches[step % 8], rng, centroids)
    if step < 3 or step >= 297 or step % 60 == 0:
        loss = float(np.asarray(m["total_loss"]))
        first.setdefault(task, loss)
        last[task] = loss
        print(f"step {step:3d} {task:<9} loss={loss:.4f}", flush=True)
dt = time.time() - t0
print(f"300 steps in {dt:.0f}s ({300/dt:.2f} steps/s, {300*256/dt:.0f} ex/s)")
for t in first:
    print(f"{t}: {first[t]:.3f} -> {last[t]:.3f}")
