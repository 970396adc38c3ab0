"""Drive text-to-image sampling end-to-end on the default platform (TPU):
full-size X-LXMERT NAR mask-predict sampler + SPADE generator render,
measuring samples/sec (BASELINE.json headline metric #2).

Weights are random-init (the released checkpoints are not available in
this environment); throughput is weight-independent.

Usage: python scripts/drive_sample.py [--batch 16] [--steps 4] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=16)
parser.add_argument("--steps", type=int, default=4)
parser.add_argument("--mode", choices=["NAR", "AR"], default="NAR")
parser.add_argument("--no-render", action="store_true")
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import xlxmert_tpu.models.lxmert as LM
from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.models.gan import Generator
from xlxmert_tpu.models.xlxmert import XLxmert
from xlxmert_tpu.tasks.sampling import make_ar_sampler, make_nar_sampler

print("devices:", jax.devices())
LM.serving_mode(True)

cfg = LxmertConfig()
B, L = args.batch, 20
model = XLxmert(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)

ids = jnp.ones((B, L), jnp.int32)
mask = jnp.ones((B, L), jnp.float32)
centroids = jax.random.normal(rng, (cfg.num_clusters, cfg.visual_feat_dim)) * 0.05

t0 = time.time()
init_fn = jax.jit(lambda r, c: model.init(
    r, ids, jnp.zeros((B, 64, cfg.visual_feat_dim), jnp.bfloat16),
    jnp.zeros((B, 64, 4)), attention_mask=mask,
    vis_mask=jnp.zeros((B, 64)), centroids=c, heads=("obj",),
    deterministic=True)["params"])
params = init_fn(rng, centroids)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
print(f"model init {time.time()-t0:.0f}s")

if args.mode == "NAR":
    sampler = make_nar_sampler(model, args.steps, 8)
    run = lambda: sampler(params, centroids, ids, mask)[0]
else:
    sampler = make_ar_sampler(model, 8, "confidence")
    run = lambda: sampler(params, centroids, ids, mask)[0]

renderer = None
if not args.no_render:
    gen = Generator(emb_dim=cfg.visual_feat_dim, base_dim=32,
                    target_size=256, init_H=8, init_W=8, codebook_dim=256,
                    dtype=jnp.bfloat16)
    g_vars = gen.init({"params": rng, "noise": rng},
                      jnp.zeros((B, 8, 8, cfg.visual_feat_dim)), train=False)
    g_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                            if x.dtype == jnp.float32 else x,
                            g_vars["params"])
    g_sn = g_vars.get("sn", {})

    @jax.jit
    def render(g_params, g_sn, code):
        img = gen.apply({"params": g_params, "sn": g_sn}, code, train=False)
        return jnp.clip((img + 1) / 2, 0, 1)

t0 = time.time()
code = run()
img = None
if renderer is None and not args.no_render:
    img = render(g_params, g_sn, code)
out = np.asarray(img if img is not None else code, np.float32)
print(f"compile+first: {time.time()-t0:.0f}s; out {out.shape}, "
      f"finite={np.isfinite(out).all()}")

# steady state: host fetch each iteration forces completion
n = 6
t0 = time.time()
for i in range(n):
    code = run()
    if not args.no_render:
        res = render(g_params, g_sn, code)
    else:
        res = code
    np.asarray(res[0, 0])
dt = (time.time() - t0) / n
print(f"steady: {dt*1e3:.1f} ms/batch -> {B/dt:.1f} samples/sec "
      f"(mode={args.mode}, steps={args.steps}, render={not args.no_render})")
