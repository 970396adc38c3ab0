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
    p.add_argument("--images_dir", default=None,
                   help="bare directory of images (alternative to "
                   "--corpus/--root)")
    p.add_argument("--out", default=None, help="output .h5 path "
                   "(derived from the corpus layout when --corpus)")
    p.add_argument("--corpus", default=None,
                   choices=["coco", "vg", "gqa", "nlvr2"],
                   help="use the reference's per-dataset file/id/output "
                   "conventions (feature_extraction/<corpus>_extract_*; "
                   "see data/corpora.py)")
    p.add_argument("--root", default=None,
                   help="corpus root (e.g. datasets/COCO) when --corpus")
    p.add_argument("--split", default=None,
                   help="corpus split {train,valid,test} (COCO/NLVR2 only)")
    p.add_argument("--weights", default=None,
                   help="resnet .pth/.msgpack (random init if omitted — "
                   "for pipeline testing only)")
    p.add_argument("--arch", default="resnet50",
                   choices=["resnet50", "resnet101", "maskrcnn"],
                   help="maskrcnn = the Detectron X-152-FPN fc6 graph the "
                   "released checkpoints were trained on (models/detectron)")
    p.add_argument("--grid_size", type=int, default=8)
    p.add_argument("--image_size", type=int, default=256,
                   help="square resize (resnet archs); for maskrcnn this is "
                   "the --imsize mode, 0 = reference min-800/max-1333")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--tiny_detectron", action="store_true",
                   help="tiny random maskrcnn config (pipeline tests)")
    p.add_argument("--group_einsum", nargs="?", const="on",
                   choices=["on", "auto", "off"], default="auto",
                   help="exact einsum lowering of the ResNeXt grouped "
                   "convs: 'auto' (default) = only stage 1 (Cg=8), the "
                   "measured per-stage winner (+10%% bf16, unlocks B=8 "
                   "fp32); 'on' = everywhere (measured loser); 'off' = "
                   "XLA grouped conv (models/detectron.group_conv_mode; "
                   "verdict in scripts/drive_group_conv.py)")
    return p.parse_args(argv)


def resolve_inputs(ns, kind: str = "grid", n_boxes: int = 36):
    """(paths, out_path) from either --images_dir/--out or the corpus
    manifest (--corpus/--root/--split)."""
    from pathlib import Path as _P

    from xlxmert_tpu.data.corpora import (
        corpus_image_paths, extractor_output_path)

    if ns.corpus:
        if not ns.root:
            raise SystemExit("--corpus requires --root")
        paths = corpus_image_paths(ns.corpus, _P(ns.root), ns.split)
        arch = getattr(ns, "arch", "maskrcnn")
        size = getattr(ns, "image_size", 0)
        if arch == "maskrcnn":
            # reference convention: tag only when --imsize mode is used
            # (0 = the min-800/max-1333 canvas, untagged)
            imsize = size or None
        else:
            # resnet archs always square-resize; tag non-default sizes
            # so two extractions at different sizes can't collide on
            # one derived output path
            imsize = size if size != 256 else None
        out = ns.out or str(extractor_output_path(
            ns.corpus, _P(ns.root), ns.split,
            getattr(ns, "arch", "maskrcnn"), kind,
            getattr(ns, "grid_size", 8), imsize, n_boxes))
        return paths, out
    if not ns.images_dir or not ns.out:
        raise SystemExit("need --images_dir and --out (or --corpus/--root)")
    paths = sorted(p for p in _P(ns.images_dir).iterdir()
                   if p.suffix.lower() in (".jpg", ".jpeg", ".png"))
    return paths, ns.out


def run_maskrcnn(ns):
    """Detectron grid path: preprocess (BGR-mean, min-800/max-1333 or
    --image_size square), batched fc6 extraction, h5 contract
    (coco_extract_grid_feature.py:236-260)."""
    import h5py
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from xlxmert_tpu.core.checkpoint import load_any_checkpoint
    from xlxmert_tpu.models.detectron import (
        DetectronConfig, DetectronGridExtractor,
        convert_detectron_state_dict, detectron_resize_shape,
        preprocess_image, tiny_detectron_config)

    cfg = tiny_detectron_config() if ns.tiny_detectron else DetectronConfig()
    model = DetectronGridExtractor(cfg, grid_size=ns.grid_size)
    imsize = ns.image_size or None
    from xlxmert_tpu.models.detectron import group_conv_mode
    mode = getattr(ns, "group_einsum", "auto") or "off"
    group_conv_mode({"on": True, "auto": "auto", "off": False}[mode])

    paths, out = resolve_inputs(ns, kind="grid")
    ns.out = out
    print(f"{len(paths)} images -> {out}")

    # fixed canvas: one compiled program for the whole run. The FPN
    # top-down pathway needs /32-divisible inputs (stride alignment —
    # same pad32 as extract_bbox_features.py); detectron_resize_shape
    # already snaps, but an explicit --image_size may not.
    pad32 = lambda v: (v + 31) // 32 * 32  # noqa: E731
    if imsize:
        if imsize % 32:
            print(f"--image_size {imsize}: images keep that size; the "
                  f"canvas zero-pads to {pad32(imsize)} "
                  f"(FPN stride alignment)")
        canvas_hw = (pad32(imsize), pad32(imsize))
    else:
        shapes = []
        for p in paths:
            with Image.open(p) as im:
                shapes.append(detectron_resize_shape(im.height, im.width))
        canvas_hw = (pad32(max(s[0] for s in shapes)),
                     pad32(max(s[1] for s in shapes)))
    print(f"canvas {canvas_hw}")

    if ns.weights:
        ckpt = load_any_checkpoint(ns.weights)
        sd = ckpt.get("model", ckpt)
        params = convert_detectron_state_dict(sd, cfg)
    else:
        print("WARNING: random-init detector (no --weights) — features are "
              "for pipeline testing only")
        # jit the init: eager flax init dispatches the whole X-152
        # op-by-op (minutes through a remote-compile tunnel)
        t0 = time.time()
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, *canvas_hw, 3)),
            jnp.asarray([[canvas_hw[0], canvas_hw[1]]], jnp.int32))["params"]
        jax.block_until_ready(params)
        print(f"detector init {time.time()-t0:.1f}s", flush=True)

    extract = jax.jit(
        lambda params, images, sizes: model.apply(
            {"params": params}, images, sizes))

    def batches():
        buf, sz, ids = [], [], []
        for path in paths:
            img = Image.open(path)
            th, tw = ((imsize, imsize) if imsize
                      else detectron_resize_shape(img.height, img.width))
            arr = preprocess_image(np.asarray(img.convert("RGB")), (th, tw))
            pad = np.zeros((*canvas_hw, 3), np.float32)
            pad[:th, :tw] = arr
            buf.append(pad)
            sz.append((th, tw))
            ids.append(path.stem)
            if len(buf) == ns.batch_size:
                yield np.stack(buf), np.asarray(sz, np.int32), ids
                buf, sz, ids = [], [], []
        if buf:
            k = ns.batch_size - len(buf)
            yield (np.concatenate(
                [np.stack(buf), np.zeros((k, *canvas_hw, 3), np.float32)]),
                np.concatenate([np.asarray(sz, np.int32),
                                np.full((k, 2), 32, np.int32)]), ids)

    Path(ns.out).parent.mkdir(parents=True, exist_ok=True)
    t0, n = time.time(), 0
    with h5py.File(ns.out, "w") as f:
        for images, sizes, ids in batches():
            feats = np.asarray(
                extract(params, jnp.asarray(images), jnp.asarray(sizes)),
                np.float32)
            if n == 0:
                print(f"first batch (jit compile) "
                      f"{time.time()-t0:.1f}s", flush=True)
            G = ns.grid_size
            for i, img_id in enumerate(ids):
                g = f.create_group(img_id)
                g.create_dataset(
                    "features", data=feats[i].reshape(G, G, -1))
            n += len(ids)
    dt = time.time() - t0
    print(f"wrote {n} features to {ns.out} in {dt:.1f}s "
          f"({n / max(dt, 1e-9):.1f} img/s)")


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

    if ns.arch == "maskrcnn":
        return run_maskrcnn(ns)

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
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, ns.image_size, ns.image_size, 3)))

    @jax.jit
    def extract(variables, images):
        return grid_features(model, variables, images, ns.grid_size)

    paths, out = resolve_inputs(ns, kind="grid")
    ns.out = out
    print(f"{len(paths)} images -> {out}")
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
