"""Bbox-feature path (C17): per-class NMS selection vs a numpy
transcription of the reference algorithm, detector smoke, decode math,
and the extract_bbox_features CLI h5 contract."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlxmert_tpu.ops.box_selection import (multiclass_nms_mask,
                                           select_top_features)


def np_iou(a, b):
    area_a = np.maximum(a[2] - a[0], 0) * np.maximum(a[3] - a[1], 0)
    area_b = np.maximum(b[2] - b[0], 0) * np.maximum(b[3] - b[1], 0)
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
    return inter / max(area_a + area_b - inter, 1e-9)


def np_greedy_nms_keep(boxes, scores, thresh):
    """Reference greedy NMS -> keep mask (the torch `nms` keep set)."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep[i] = True
        for j in order:
            if j != i and not suppressed[j] and \
                    np_iou(boxes[i], boxes[j]) > thresh:
                suppressed[j] = True
    return keep


def np_process(proposals, cls_logits, feats, im_scale, num_features,
               conf_thresh=0.0, background=False):
    """Numpy transcription of _process_feature_extraction
    (coco_extract_bbox_feature.py:80-129)."""
    e = np.exp(cls_logits - cls_logits.max(axis=1, keepdims=True))
    scores = e / e.sum(axis=1, keepdims=True)
    dets = proposals / im_scale
    start = 0 if background else 1
    max_conf = np.zeros(len(dets))
    for c in range(start, scores.shape[1]):
        cls_scores = scores[:, c]
        keep = np_greedy_nms_keep(dets, cls_scores, 0.5)
        upd = keep & (cls_scores > max_conf) & (cls_scores > conf_thresh)
        max_conf = np.where(upd, cls_scores, max_conf)
    order = np.argsort(-max_conf, kind="stable")
    keep_boxes = order[:num_features]
    num_boxes = (np.sort(max_conf)[::-1][:num_features] != 0).sum()
    objects = np.argmax(scores[keep_boxes, start:], axis=1)
    return {"features": feats[keep_boxes], "boxes": dets[keep_boxes],
            "obj_id": objects, "num_boxes": num_boxes,
            "max_conf": max_conf}


def random_boxes(rng, n, lim=100):
    x0 = rng.uniform(0, lim * 0.8, n)
    y0 = rng.uniform(0, lim * 0.8, n)
    w = rng.uniform(5, lim * 0.5, n)
    h = rng.uniform(5, lim * 0.5, n)
    return np.stack([x0, y0, x0 + w, y0 + h], axis=1).astype(np.float32)


def test_multiclass_nms_matches_per_class_greedy():
    rng = np.random.RandomState(0)
    P, C = 24, 5
    boxes = random_boxes(rng, P)
    scores = rng.rand(P, C).astype(np.float32)
    ours = np.asarray(multiclass_nms_mask(jnp.asarray(boxes),
                                          jnp.asarray(scores), 0.5))
    for c in range(C):
        ref = np_greedy_nms_keep(boxes, scores[:, c], 0.5)
        np.testing.assert_array_equal(ours[:, c], ref), c


def test_select_top_features_matches_reference_transcription():
    rng = np.random.RandomState(1)
    P, C, D, N = 30, 7, 12, 8
    proposals = random_boxes(rng, P) * 1.5
    logits = rng.randn(P, C).astype(np.float32) * 2
    feats = rng.randn(P, D).astype(np.float32)
    im_scale = 1.5

    ref = np_process(proposals, logits, feats, im_scale, N)
    out = jax.tree.map(np.asarray, select_top_features(
        jnp.asarray(proposals), jnp.asarray(logits), jnp.asarray(feats),
        im_scale, num_features=N))

    # the selected SET must match; ordering can differ on exact ties
    np.testing.assert_allclose(
        np.sort(out["features"], axis=0), np.sort(ref["features"], axis=0),
        atol=1e-5)
    np.testing.assert_allclose(np.sort(out["boxes"], axis=0),
                               np.sort(ref["boxes"], axis=0), atol=1e-4)
    assert int(out["num_boxes"]) == int(ref["num_boxes"])
    assert sorted(out["obj_id"].tolist()) == sorted(ref["obj_id"].tolist())


def test_select_respects_valid_mask():
    rng = np.random.RandomState(2)
    P, C, D = 12, 4, 6
    proposals = random_boxes(rng, P)
    logits = rng.randn(P, C).astype(np.float32)
    feats = rng.randn(P, D).astype(np.float32)
    valid = np.ones(P, bool)
    valid[6:] = False
    out = jax.tree.map(np.asarray, select_top_features(
        jnp.asarray(proposals), jnp.asarray(logits), jnp.asarray(feats),
        1.0, valid=jnp.asarray(valid), num_features=6))
    # only valid proposals may be selected with nonzero conf
    sel_rows = {tuple(np.round(r, 4)) for r in out["boxes"][:int(out["num_boxes"])]}
    valid_rows = {tuple(np.round(r, 4)) for r in proposals[:6]}
    assert sel_rows <= valid_rows


def test_decode_boxes_matches_reference_math():
    from xlxmert_tpu.models.detectron import decode_boxes

    anchors = np.array([[0, 0, 15, 15], [10, 20, 49, 39]], np.float32)
    deltas = np.array([[0.1, -0.2, 0.3, 0.0], [0.0, 0.0, 0.0, 0.0]],
                      np.float32)
    out = np.asarray(decode_boxes(jnp.asarray(anchors), jnp.asarray(deltas)))
    # TO_REMOVE=1 convention: zero deltas reproduce the anchor exactly
    np.testing.assert_allclose(out[1], anchors[1], atol=1e-4)
    w, h = 16.0, 16.0
    # maskrcnn-benchmark BoxCoder: ctr = x0 + 0.5 * w (TO_REMOVE=1 width)
    cx, cy = 8.0 + 0.1 * w, 8.0 - 0.2 * h
    pw = np.exp(0.3) * w
    np.testing.assert_allclose(
        out[0], [cx - pw / 2, cy - h / 2, cx + pw / 2 - 1, cy + h / 2 - 1],
        rtol=1e-5)


def test_detector_smoke_shapes():
    from xlxmert_tpu.models.detectron import (DetectronDetector,
                                              tiny_detectron_config)

    cfg = tiny_detectron_config()
    model = DetectronDetector(cfg, n_classes=9, pre_nms_top_n=50,
                              post_nms_top_n=20, fpn_post_nms_top_n=20)
    images = jnp.asarray(np.random.RandomState(0)
                         .randn(2, 64, 64, 3).astype(np.float32))
    sizes = jnp.asarray([[64, 64], [48, 64]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), images, sizes)
    proposals, cls_scores, feats, obj = model.apply(variables, images, sizes)
    assert proposals.shape == (2, 20, 4)
    assert cls_scores.shape == (2, 20, 9)
    assert feats["fc6"].shape == (2, 20, cfg.mlp_dim)
    assert np.isfinite(np.asarray(proposals)).all()
    # proposals are clipped to the valid image region
    p1 = np.asarray(proposals[1])
    assert p1[:, 3].max() <= 48 - 1 + 1e-3


def test_extract_bbox_features_cli(tmp_path):
    import h5py
    from PIL import Image

    from xlxmert_tpu.cli.extract_bbox_features import main

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, (h, w) in enumerate([(40, 56), (56, 40)]):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            img_dir / f"im{i}.jpg")

    out = tmp_path / "maskrcnn_test_boxes8.h5"
    main(["--images_dir", str(img_dir), "--out", str(out),
          "--tiny_detectron", "--num_features", "8", "--n_classes", "9",
          "--proposals", "24", "--batch_size", "2",
          "--min_size", "64", "--max_size", "96"])
    with h5py.File(out) as f:
        assert set(f.keys()) == {"im0", "im1"}
        g = f["im0"]
        assert g["features"][()].shape == (8, 24)  # tiny mlp_dim
        assert g["obj_id"][()].shape == (8,)
        assert g["boxes"][()].shape == (8, 4)
        # boxes are in ORIGINAL image coordinates
        assert int(g["img_w"][()]) == 56 and int(g["img_h"][()]) == 40
        assert np.isfinite(g["boxes"][()]).all()
        assert g["boxes"][()].max() <= 56 + 1
