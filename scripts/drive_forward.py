"""Drive the flagship model end-to-end on the default platform (TPU when
available): build the full-size LXMERT through the public package boundary,
jit a batched VQA-style forward, run it, and print observable output.

Usage: python scripts/drive_forward.py [--batch 64] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=64)
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.models.lxmert import LxmertModel, VisualAnswerHead
from xlxmert_tpu.utils.boxes import box_position

print("devices:", jax.devices())

cfg = LxmertConfig()
B, L, V = args.batch, 20, 64
rng = jax.random.PRNGKey(0)

model = LxmertModel(cfg, dtype=jnp.bfloat16)
head = VisualAnswerHead(cfg, num_labels=3129, dtype=jnp.bfloat16)

ids = jnp.ones((B, L), jnp.int32)
mask = jnp.ones((B, L), jnp.float32)
feats = jax.random.normal(rng, (B, V, cfg.visual_feat_dim), jnp.float32) * 0.1
pos = jnp.broadcast_to(jnp.asarray(box_position(8))[None], (B, V, 4))

t0 = time.time()
params = model.init(rng, ids, feats, pos, attention_mask=mask)["params"]
head_params = head.init(rng, jnp.zeros((B, cfg.hidden_size)))["params"]
print(f"init: {time.time()-t0:.1f}s; param count:",
      sum(x.size for x in jax.tree.leaves(params)))


@jax.jit
def vqa_forward(params, head_params, ids, feats, pos, mask):
    _, _, pooled = model.apply({"params": params}, ids, feats, pos,
                               attention_mask=mask, deterministic=True)
    return head.apply({"params": head_params}, pooled)


t0 = time.time()
logits = jax.block_until_ready(vqa_forward(params, head_params, ids, feats, pos, mask))
print(f"compile+first run: {time.time()-t0:.1f}s; logits {logits.shape} {logits.dtype}")

t0 = time.time()
n = 20
for _ in range(n):
    logits = vqa_forward(params, head_params, ids, feats, pos, mask)
jax.block_until_ready(logits)
dt = (time.time() - t0) / n
print(f"steady-state: {dt*1e3:.2f} ms/batch -> {B/dt:.0f} queries/sec")
print("logit sample:", np.asarray(logits[0, :5], dtype=np.float32))
print("argmax:", int(jnp.argmax(logits[0])), "finite:", bool(jnp.isfinite(logits).all()))
