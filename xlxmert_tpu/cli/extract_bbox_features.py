"""Bbox-feature extraction CLI (the C17 path) — TPU-native replacement
for feature_extraction/*_extract_bbox_feature.py.

Per image: full detector pass (RPN proposals + box-head class scores +
fc6 features, models/detectron.DetectronDetector), per-class NMS and
max-confidence top-36 selection (ops/box_selection, transcribing
coco_extract_bbox_feature.py:80-129), then the reference h5 contract
(:296-335): per img_id groups with features (36, 2048), obj_id (36,),
boxes (36, 4) in ORIGINAL image coordinates, img_w, img_h.

python -m xlxmert_tpu.cli.extract_bbox_features \
    --images_dir datasets/COCO/images/val2014 \
    --out datasets/COCO/features/maskrcnn_valid_boxes36.h5 \
    --weights detectron_model.pth
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

NUM_FEATURES = 36  # coco_extract_bbox_feature.py:42


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images_dir", default=None,
                   help="bare image dir (alternative to --corpus/--root)")
    p.add_argument("--out", default=None, help="output .h5 path "
                   "(derived from the corpus layout when --corpus)")
    p.add_argument("--corpus", default=None,
                   choices=["coco", "vg", "gqa", "nlvr2"],
                   help="reference per-dataset conventions "
                   "(feature_extraction/<corpus>_extract_bbox_feature.py; "
                   "data/corpora.py)")
    p.add_argument("--root", default=None, help="corpus root")
    p.add_argument("--split", default=None,
                   help="{train,valid,test} (COCO/NLVR2 only)")
    p.add_argument("--weights", default=None,
                   help="detectron_model.pth / .msgpack (random init if "
                   "omitted — pipeline testing only)")
    p.add_argument("--num_features", type=int, default=NUM_FEATURES)
    p.add_argument("--n_classes", type=int, default=1601)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--confidence_threshold", type=float, default=0.0)
    p.add_argument("--background", action="store_true",
                   help="include the background column in selection")
    p.add_argument("--proposals", type=int, default=1000,
                   help="RPN post-NMS proposal budget")
    p.add_argument("--tiny_detectron", action="store_true",
                   help="tiny random config (pipeline tests)")
    p.add_argument("--min_size", type=int, default=800)
    p.add_argument("--max_size", type=int, default=1333)
    p.add_argument("--group_einsum", nargs="?", const="on",
                   choices=["on", "auto", "off"], default="auto",
                   help="grouped-conv lowering for the ResNeXt backbone "
                   "(same semantics as cli/extract_features; 'auto' is "
                   "the measured per-stage winner)")
    return p.parse_args(argv)


def main(argv=None):
    ns = parse_args(argv)

    import h5py
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from xlxmert_tpu.core.checkpoint import load_any_checkpoint
    from xlxmert_tpu.models.detectron import (
        DetectronConfig, DetectronDetector, convert_detectron_state_dict,
        preprocess_image, tiny_detectron_config)
    from xlxmert_tpu.ops.box_selection import select_top_features

    from xlxmert_tpu.models.detectron import group_conv_mode
    mode = getattr(ns, "group_einsum", "auto") or "off"
    group_conv_mode({"on": True, "auto": "auto", "off": False}[mode])

    cfg = tiny_detectron_config() if ns.tiny_detectron else DetectronConfig()
    model = DetectronDetector(
        cfg, n_classes=ns.n_classes, pre_nms_top_n=ns.proposals,
        post_nms_top_n=ns.proposals, fpn_post_nms_top_n=ns.proposals)

    from xlxmert_tpu.cli.extract_features import resolve_inputs

    ns.arch = "maskrcnn"  # the reference's fixed bbox backbone tag
    ns.image_size = 0
    paths, out = resolve_inputs(ns, kind="bbox", n_boxes=ns.num_features)
    ns.out = out
    print(f"{len(paths)} images -> {out}")

    def scaled_shape(h, w):
        # bbox path: exact min/max scaling, NO /32 snap; the canvas is
        # padded to /32 instead (to_image_list(size_divisible=32),
        # coco_extract_bbox_feature.py:144-146,194-204)
        scale = ns.min_size / min(h, w)
        if round(scale * max(h, w)) > ns.max_size:
            scale = ns.max_size / max(h, w)
        return int(scale * h), int(scale * w), scale

    shapes = []
    for p in paths:
        with Image.open(p) as im:
            shapes.append(scaled_shape(im.height, im.width))
    pad32 = lambda v: (v + 31) // 32 * 32
    canvas_hw = (pad32(max(s[0] for s in shapes)),
                 pad32(max(s[1] for s in shapes)))
    print(f"canvas {canvas_hw}")

    if ns.weights:
        ckpt = load_any_checkpoint(ns.weights)
        params = convert_detectron_state_dict(ckpt.get("model", ckpt), cfg)
    else:
        print("WARNING: random-init detector (no --weights) — features are "
              "for pipeline testing only")
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, *canvas_hw, 3)),
            jnp.asarray([[canvas_hw[0], canvas_hw[1]]], jnp.int32))["params"]

    @jax.jit
    def run(params, images, sizes, scales):
        proposals, cls_scores, feats, obj_scores = model.apply(
            {"params": params}, images, sizes)
        valid = jnp.isfinite(obj_scores)

        def sel(p, s, f, scale, v):
            return select_top_features(
                p, s, f, scale, valid=v, num_features=ns.num_features,
                conf_thresh=ns.confidence_threshold,
                background=ns.background)

        return jax.vmap(sel)(proposals, cls_scores, feats["fc6"], scales,
                             valid)

    def batches():
        buf, sz, scl, ids, orig = [], [], [], [], []
        for path in paths:
            img = Image.open(path)
            th, tw, scale = scaled_shape(img.height, img.width)
            arr = preprocess_image(np.asarray(img.convert("RGB")), (th, tw))
            pad = np.zeros((*canvas_hw, 3), np.float32)
            pad[:th, :tw] = arr
            buf.append(pad)
            sz.append((th, tw))
            scl.append(scale)
            ids.append(path.stem)
            orig.append((img.width, img.height))
            if len(buf) == ns.batch_size:
                yield (np.stack(buf), np.asarray(sz, np.int32),
                       np.asarray(scl, np.float32), ids, orig)
                buf, sz, scl, ids, orig = [], [], [], [], []
        if buf:
            k = ns.batch_size - len(buf)
            yield (np.concatenate([np.stack(buf),
                                   np.zeros((k, *canvas_hw, 3), np.float32)]),
                   np.concatenate([np.asarray(sz, np.int32),
                                   np.full((k, 2), 32, np.int32)]),
                   np.concatenate([np.asarray(scl, np.float32),
                                   np.ones(k, np.float32)]), ids, orig)

    Path(ns.out).parent.mkdir(parents=True, exist_ok=True)
    t0, n = time.time(), 0
    with h5py.File(ns.out, "w") as f:
        for images, sizes, scales, ids, orig in batches():
            out = jax.tree.map(
                np.asarray,
                run(params, jnp.asarray(images), jnp.asarray(sizes),
                    jnp.asarray(scales)))
            for i, img_id in enumerate(ids):
                g = f.create_group(img_id)
                g["features"] = out["features"][i].astype(np.float32)
                g["obj_id"] = out["obj_id"][i]
                g["boxes"] = out["boxes"][i].astype(np.float32)
                g["img_w"] = orig[i][0]
                g["img_h"] = orig[i][1]
            n += len(ids)
    dt = time.time() - t0
    print(f"wrote {n} box features to {ns.out} in {dt:.1f}s "
          f"({n / max(dt, 1e-9):.1f} img/s)")


if __name__ == "__main__":
    main()
