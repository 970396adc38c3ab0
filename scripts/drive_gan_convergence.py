"""GAN convergence smoke on the real TPU at production shapes.

Trains the reconstructed SPADE-GAN recipe (hinge + ACGAN + feature
matching; tasks/train_generator.py) for a few hundred steps at the
reference's production geometry (2048-d codes, 8x8 grid, 256px output,
g_base 32 / d_base 64, Adam beta1=0, g_lr 4e-4 / d_lr 1e-4 — matching
image_generator/scripts/train_generator.bash) on a synthetic but
LEARNABLE distribution: each "real" image is a deterministic smooth
rendering of its cluster-code grid, so the generator has a target
mapping and relative FID (random-init ResNet features, utils/fid.py)
must trend down if the training recipe works.

Exit code 1 if FID does not improve — this is a check, not a demo.
"""
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n_data", type=int, default=128)
    p.add_argument("--fid_every", type=int, default=50)
    p.add_argument("--target_size", type=int, default=256)
    p.add_argument("--n_classes", type=int, default=10000)
    p.add_argument("--norm_type", default="spade_in",
                   choices=["spade_in", "spade_bn"])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--chain", type=int, default=0,
                   help="measure K chained (D,G) pairs in one jit "
                   "(true device rate; cancels tunnel round-trip) and "
                   "exit without the convergence run")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from xlxmert_tpu.core.config import GanConfig
    from xlxmert_tpu.models.resnet import resnet50
    from xlxmert_tpu.tasks.train_generator import GanEngine
    from xlxmert_tpu.utils.fid import compute_fid, resnet_feature_fn

    print("devices:", jax.devices(), flush=True)
    GRID, EMB = 8, 2048
    rng = np.random.RandomState(0)

    # learnable synthetic distribution: cluster id -> fixed color; real
    # image = smooth 8x8->256 upsample of the per-cell color map
    centroids = (rng.randn(args.n_classes, EMB) * 0.2).astype(np.float32)
    palette = rng.rand(args.n_classes, 3).astype(np.float32)
    ids = rng.randint(0, args.n_classes,
                      (args.n_data, GRID * GRID)).astype(np.int32)

    from xlxmert_tpu.models.gan import resize_bilinear

    color_maps = palette[ids].reshape(args.n_data, GRID, GRID, 3)
    real = np.asarray(resize_bilinear(
        jnp.asarray(color_maps),
        (args.target_size, args.target_size)))  # [0,1]
    real_tanh = real * 2.0 - 1.0
    codes = centroids[ids].reshape(args.n_data, GRID, GRID, EMB)

    cfg = GanConfig(emb_dim=EMB, init_H=GRID, init_W=GRID,
                    target_size=args.target_size, n_classes=args.n_classes,
                    batch_size=args.batch, norm_type=args.norm_type,
                    mixed_precision=True)
    eng = GanEngine(cfg)
    centroids_j = jnp.asarray(centroids)
    state = eng.create_state(jax.random.PRNGKey(0), centroids_j)
    print(f"engine ready (norm={args.norm_type})", flush=True)
    key = jax.random.PRNGKey(1)

    if args.chain:
        # throughput-only mode: skip the FID ResNet init/compile
        K = args.chain
        sel = rng.randint(0, args.n_data, args.batch)
        batch = eng.place({"image": real_tanh[sel], "code": codes[sel],
                           "cluster_id": ids[sel]})
        fn = eng.chained_gd_step(K)
        state, dl, gl = fn(state, batch, centroids_j, key)  # compile
        float(np.asarray(dl))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            state, dl, gl = fn(state, batch, centroids_j, key)
            float(np.asarray(dl))
            best = min(best, time.time() - t0)
        per_pair = best / K
        print(f"chained x{K} (D+G pairs, {args.target_size}px, "
              f"B={args.batch}): {per_pair*1e3:7.1f} ms/pair "
              f"{args.batch/per_pair:8.1f} imgs/s/chip "
              f"(d {float(np.asarray(dl)):.3f} g {float(np.asarray(gl)):.3f})",
              flush=True)
        return

    fid_vars = resnet50().init(jax.random.PRNGKey(7),
                               jnp.zeros((1, 64, 64, 3)))
    feat_fn = resnet_feature_fn(fid_vars)
    render = eng.render()

    def fid_now():
        fakes = []
        for s in range(0, args.n_data, args.batch):
            code = jnp.asarray(codes[s:s + args.batch])
            img = render(state.params_g, state.sn_g, code,
                         state.stats_g or None)
            fakes.append(np.asarray(img, np.float32))
        fake = np.concatenate(fakes)
        B = args.batch
        return compute_fid(
            (real[i:i + B] for i in range(0, args.n_data, B)),
            (fake[i:i + B] for i in range(0, args.n_data, B)), feat_fn)

    d_step, g_step = eng.d_step(), eng.g_step()
    fids = []
    t0 = time.time()
    for step in range(args.steps + 1):
        if step % args.fid_every == 0:
            f = fid_now()
            fids.append(f)
            print(f"step {step:4d}: rel-FID {f:.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        sel = rng.randint(0, args.n_data, args.batch)
        batch = eng.place({
            "image": real_tanh[sel],
            "code": codes[sel],
            "cluster_id": ids[sel],
        })
        state, dm = d_step(state, batch, centroids_j,
                           jax.random.fold_in(key, 2 * step))
        state, gm = g_step(state, batch, centroids_j,
                           jax.random.fold_in(key, 2 * step + 1))
        if step % 50 == 0:
            print(f"  d_total {float(np.asarray(dm['d_total'])):.3f} "
                  f"g_total {float(np.asarray(gm['g_total'])):.3f}",
                  flush=True)

    improved = fids[-1] < fids[0] * 0.8
    print(f"rel-FID trend: {['%.1f' % f for f in fids]} "
          f"improved={improved}", flush=True)
    sys.exit(0 if improved else 1)


if __name__ == "__main__":
    main()
