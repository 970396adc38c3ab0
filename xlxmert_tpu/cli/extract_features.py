"""Grid-feature extraction CLI — the TPU-native replacement for the
maskrcnn-benchmark extractors (feature_extraction/*_extract_grid_feature.py;
the reference runs batch=1 on a CUDA detector, SURVEY.md §3.4).

Batched, jit-compiled ResNet backbone emitting (grid, grid, 2048) features
per image, written to the reference's h5 contract
(f[img_id]['features']).

python -m xlxmert_tpu.cli.extract_features --images_dir path/to/jpgs \
    --out data/mscoco_imgfeat/resnet_train_grid8.h5 \
    --weights resnet50.pth --image_size 256 --batch_size 64
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images_dir", required=True)
    p.add_argument("--out", required=True, help="output .h5 path")
    p.add_argument("--weights", default=None,
                   help="resnet .pth/.msgpack (random init if omitted — "
                   "for pipeline testing only)")
    p.add_argument("--arch", default="resnet50",
                   choices=["resnet50", "resnet101"])
    p.add_argument("--grid_size", type=int, default=8)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=64)
    return p.parse_args(argv)


def iter_image_batches(paths, image_size, batch_size):
    from PIL import Image

    batch, ids = [], []
    for path in paths:
        img = Image.open(path).convert("RGB").resize(
            (image_size, image_size), Image.LANCZOS)
        batch.append(np.asarray(img, np.float32) / 255.0)
        ids.append(path.stem)
        if len(batch) == batch_size:
            yield np.stack(batch), ids
            batch, ids = [], []
    if batch:
        pad = batch_size - len(batch)
        yield np.concatenate([np.stack(batch),
                              np.zeros((pad, image_size, image_size, 3),
                                       np.float32)]), ids


def main(argv=None):
    ns = parse_args(argv)

    import h5py
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.core.checkpoint import load_any_checkpoint
    from xlxmert_tpu.core.convert import split_variables
    from xlxmert_tpu.models.resnet import (
        ResNet, grid_features, resnet101, resnet50,
    )

    model = resnet50() if ns.arch == "resnet50" else resnet101()
    if ns.weights:
        tree = load_any_checkpoint(ns.weights)
        cols = split_variables(tree)
        variables = {"params": cols["params"],
                     "batch_stats": cols.get("batch_stats", {})}
    else:
        print("WARNING: random-init backbone (no --weights) — features are "
              "for pipeline testing only")
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, ns.image_size, ns.image_size, 3)))

    @jax.jit
    def extract(variables, images):
        return grid_features(model, variables, images, ns.grid_size)

    paths = sorted(p for p in Path(ns.images_dir).iterdir()
                   if p.suffix.lower() in (".jpg", ".jpeg", ".png"))
    print(f"{len(paths)} images")
    Path(ns.out).parent.mkdir(parents=True, exist_ok=True)
    t0, n = time.time(), 0
    with h5py.File(ns.out, "w") as f:
        for images, ids in iter_image_batches(paths, ns.image_size,
                                              ns.batch_size):
            feats = np.asarray(extract(variables, jnp.asarray(images)),
                               np.float32)
            for i, img_id in enumerate(ids):
                g = f.create_group(img_id)
                g.create_dataset("features", data=feats[i])
            n += len(ids)
    dt = time.time() - t0
    print(f"wrote {n} features to {ns.out} in {dt:.1f}s "
          f"({n / max(dt, 1e-9):.1f} img/s)")


if __name__ == "__main__":
    main()
