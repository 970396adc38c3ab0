"""GAN generator training CLI (reference image_generator/scripts/
train_generator.bash + src/main.py:29-332; trainer loop reconstructed —
the reference's trainer.py is missing from its repo).

python -m xlxmert_tpu.cli.train_generator \
    --data_root data --images_dir data/coco/train2014 \
    --centroids data/cluster_centroids/..._grid8.npy \
    --cluster_pkl data/cluster_ids/..._train_....pkl \
    --batch_size 16 --epochs 101 --g_base_dim 32 --d_base_dim 64
"""
from __future__ import annotations

import argparse
import random
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images_dir", required=True,
                   help="raw images (COCO train2014)")
    p.add_argument("--centroids", required=True)
    p.add_argument("--cluster_pkl", required=True)
    p.add_argument("--output", default="snap/generator")
    p.add_argument("--epochs", type=int, default=101)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--g_base_dim", type=int, default=32)
    p.add_argument("--d_base_dim", type=int, default=64)
    p.add_argument("--codebook_dim", type=int, default=256)
    p.add_argument("--resize_target_size", type=int, default=256)
    p.add_argument("--n_grid", type=int, default=8)
    p.add_argument("--emb_dim", type=int, default=2048)
    p.add_argument("--g_lr", type=float, default=4e-4)
    p.add_argument("--d_lr", type=float, default=1e-4)
    p.add_argument("--gan_loss_lambda", type=float, default=1.0)
    p.add_argument("--gan_loss_cluster_lambda", type=float, default=1.0)
    p.add_argument("--gan_feat_match_lambda", type=float, default=10.0)
    p.add_argument("--feat_loss_lambda", type=float, default=10.0)
    p.add_argument("--classifier", default="resnet50",
                   help="perceptual encoder arch")
    p.add_argument("--classifier_weights", default=None,
                   help="pretrained resnet weights (.pth); perceptual loss "
                   "is disabled when omitted")
    # accepted for train_generator.bash compatibility; the engine always
    # trains the reference recipe (hinge + ACGAN + SN,
    # tasks/train_generator.py) — these are not ablation switches
    p.add_argument("--ACGAN", action="store_true",
                   help="always on (script-compat no-op)")
    p.add_argument("--SN", action="store_true",
                   help="always on (script-compat no-op)")
    p.add_argument("--hinge", action="store_true",
                   help="always on (script-compat no-op)")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--log_step", type=int, default=100)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--rng_impl", default="rbg",
                   choices=["rbg", "threefry2x32", "unsafe_rbg"])
    p.add_argument("--train_topk", type=int, default=-1)
    p.add_argument("--save_full_state", action="store_true",
                   help="also save G_{epoch}_FULL.msgpack (G+D params, "
                   "SN vectors, BN stats, both optimizers, step) for "
                   "exact resume via --resume")
    p.add_argument("--resume", default=None,
                   help="G_{epoch}_FULL.msgpack to exact-resume from "
                   "(restores discriminator + optimizer state; the "
                   "reference cannot resume GAN training at all — its "
                   "trainer.py is missing and only G is checkpointed)")
    return p.parse_args(argv)


def image_code_batches(paths, cluster_map, centroids, cfg, batch_size,
                       shuffle_seed=None):
    """Raw JPEG + cluster-id batches (data_utils.py:62-268 equivalent):
    image resized to target, scaled to [-1, 1]; code = centroid embedding
    of the image's cluster ids."""
    from PIL import Image

    order = list(range(len(paths)))
    if shuffle_seed is not None:
        random.Random(shuffle_seed).shuffle(order)
    imgs, codes, idss = [], [], []
    for i in order:
        path = paths[i]
        img_id = path.stem
        ids = cluster_map.get(img_id)
        img = Image.open(path).convert("RGB").resize(
            (cfg.target_size, cfg.target_size), Image.LANCZOS)
        imgs.append(np.asarray(img, np.float32) / 127.5 - 1.0)
        codes.append(centroids[ids].reshape(cfg.init_H, cfg.init_W, -1))
        idss.append(ids)
        if len(imgs) == batch_size:
            yield {"image": np.stack(imgs), "code": np.stack(codes),
                   "cluster_id": np.stack(idss).astype(np.int32)}
            imgs, codes, idss = [], [], []


def main(argv=None):
    ns = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.parallel.mesh import maybe_initialize_multihost

    maybe_initialize_multihost()

    from xlxmert_tpu.core.checkpoint import save_pytree
    from xlxmert_tpu.core.config import GanConfig
    from xlxmert_tpu.core.metrics import LossMeter, RunLogger
    from xlxmert_tpu.data.io import ClusterMap, PrefetchLoader
    from xlxmert_tpu.tasks.train_generator import GanEngine

    cfg = GanConfig(
        emb_dim=ns.emb_dim, codebook_dim=ns.codebook_dim,
        g_base_dim=ns.g_base_dim, d_base_dim=ns.d_base_dim,
        init_H=ns.n_grid, init_W=ns.n_grid,
        target_size=ns.resize_target_size,
        lambda_adv=ns.gan_loss_lambda,
        lambda_cls=ns.gan_loss_cluster_lambda,
        lambda_feat_match=ns.gan_feat_match_lambda,
        lambda_feat=ns.feat_loss_lambda,
        g_lr=ns.g_lr, d_lr=ns.d_lr, batch_size=ns.batch_size,
        epochs=ns.epochs, seed=ns.seed, output=ns.output,
        mixed_precision=not ns.fp32, rng_impl=ns.rng_impl,
        n_classes=int(np.load(ns.centroids, mmap_mode="r").shape[0]))

    from xlxmert_tpu.core.config import apply_rng_impl

    apply_rng_impl(cfg)
    logger = RunLogger(cfg.output, cfg, enabled=jax.process_index() == 0)

    perceptual_vars = None
    if ns.classifier_weights:
        from xlxmert_tpu.core.checkpoint import load_any_checkpoint
        from xlxmert_tpu.core.convert import split_variables

        cols = split_variables(load_any_checkpoint(ns.classifier_weights))
        perceptual_vars = {"params": cols["params"],
                           "batch_stats": cols.get("batch_stats", {})}
    else:
        logger.info("no --classifier_weights: perceptual loss disabled")

    eng = GanEngine(cfg, perceptual_variables=perceptual_vars)
    centroids_np = np.load(ns.centroids).astype(np.float32)
    centroids = jnp.asarray(centroids_np)
    cluster_map = ClusterMap(ns.cluster_pkl)

    paths = sorted(p for p in Path(ns.images_dir).iterdir()
                   if p.suffix.lower() in (".jpg", ".jpeg", ".png"))
    paths = [p for p in paths if p.stem in cluster_map]
    if ns.train_topk > 0:
        paths = paths[:ns.train_topk]
    paths = paths[jax.process_index()::jax.process_count()]
    logger.info(f"{len(paths)} images; devices {jax.devices()}")

    state = eng.create_state(jax.random.PRNGKey(cfg.seed), centroids)
    rng = jax.random.PRNGKey(cfg.seed)
    meters = {"g": LossMeter(), "d": LossMeter()}
    step = 0
    start_epoch = 0
    if ns.resume:
        import re

        from xlxmert_tpu.core.checkpoint import load_pytree, restore_state

        tree = load_pytree(ns.resume)
        saved_epoch = tree.pop("epoch", None)
        state, _ = restore_state(state, tree)
        step = int(np.asarray(state.step))
        if saved_epoch is not None:
            # authoritative: stored inside the tree at save time, so a
            # renamed/copied checkpoint resumes at the right epoch
            start_epoch = int(np.asarray(saved_epoch)) + 1
        else:
            m = re.search(r"G_(\d+)_FULL", Path(ns.resume).name)
            start_epoch = int(m.group(1)) + 1 if m else 0
        logger.info(f"exact-resumed GAN state from {ns.resume} at "
                    f"epoch {start_epoch}, step {step}")
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        loader = PrefetchLoader(lambda: image_code_batches(
            paths, cluster_map, centroids_np, cfg, cfg.batch_size,
            shuffle_seed=cfg.seed + epoch))
        for batch in loader:
            batch = eng.place(batch)
            state, dm = eng.d_step()(state, batch, centroids,
                                     jax.random.fold_in(rng, step))
            state, gm = eng.g_step()(state, batch, centroids,
                                     jax.random.fold_in(rng, step + 1))
            if step % ns.log_step == 0:
                meters["g"].update(float(np.asarray(gm["g_total"])))
                meters["d"].update(float(np.asarray(dm["d_total"])))
                logger.scalars(step, {
                    **{k: float(np.asarray(v)) for k, v in gm.items()},
                    **{k: float(np.asarray(v)) for k, v in dm.items()}})
            step += 2
        logger.info(f"epoch {epoch}: G {meters['g'].val:.4f} "
                    f"D {meters['d'].val:.4f} ({time.time()-t0:.0f}s)")
        if jax.process_index() == 0:
            tree = {"params": jax.tree.map(np.asarray, state.params_g),
                    "sn": jax.tree.map(np.asarray, state.sn_g)}
            if state.stats_g:
                tree["batch_stats"] = jax.tree.map(np.asarray, state.stats_g)
            save_pytree(tree, str(Path(cfg.output) / f"G_{epoch}.msgpack"))
            if ns.save_full_state:
                from flax import serialization

                full = serialization.to_state_dict(state)
                # epoch lives INSIDE the tree: a renamed/copied
                # checkpoint must still resume at the right epoch (the
                # filename regex is only the legacy fallback)
                full["epoch"] = np.asarray(epoch, np.int32)
                save_pytree(full,
                            str(Path(cfg.output)
                                / f"G_{epoch}_FULL.msgpack"))
    logger.close()


if __name__ == "__main__":
    main()
