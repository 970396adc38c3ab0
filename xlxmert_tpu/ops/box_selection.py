"""Bbox-feature selection: per-class NMS + max-confidence top-N.

Transcribes _process_feature_extraction
(/root/reference/feature_extraction/coco_extract_bbox_feature.py:80-129):
softmax class scores; for every foreground class, greedy NMS (IoU 0.5)
over the proposal boxes; a proposal's "max_conf" is the highest class
probability under which it survived its class's NMS (and exceeded
conf_thresh); the top `num_features` proposals by max_conf are kept, and
each reports its best foreground class as obj_id.

TPU-native formulation: the pairwise IoU matrix is computed ONCE and
shared across all ~1600 classes; greedy NMS for all classes advances in
lockstep inside one `lax.fori_loop` over (n_classes, P) score tables —
static shapes, no per-class python loop, no CUDA NMS op.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from xlxmert_tpu.ops.nms import iou_matrix

NEG = -1e9


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def multiclass_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                        iou_threshold: float = 0.5,
                        valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Greedy per-class NMS for all classes at once.

    boxes (P, 4) xyxy, scores (P, C) per-class scores, valid (P,) bool
    (padded proposals). Returns keep mask (P, C) — True where the
    proposal survives that class's NMS.
    """
    P, C = scores.shape
    iou = iou_matrix(boxes)  # shared across classes
    live = scores.T.astype(jnp.float32)  # (C, P)
    if valid is not None:
        live = jnp.where(valid[None, :], live, NEG)
    keep = jnp.zeros((C, P), bool)

    def body(_, carry):
        live, keep = carry
        top = jnp.argmax(live, axis=1)  # (C,)
        top_val = jnp.take_along_axis(live, top[:, None], axis=1)[:, 0]
        ok = top_val > NEG / 2
        keep = keep.at[jnp.arange(C), top].max(ok)
        rows = iou[top]  # (C, P)
        suppress = (rows > iou_threshold) | (
            jnp.arange(P)[None, :] == top[:, None])
        live = jnp.where(suppress & ok[:, None], NEG, live)
        return live, keep

    _, keep = jax.lax.fori_loop(0, P, body, (live, keep))
    return keep.T  # (P, C)


@functools.partial(jax.jit,
                   static_argnames=("num_features", "background"))
def select_top_features(proposals: jnp.ndarray, cls_logits: jnp.ndarray,
                        feats: jnp.ndarray, im_scale,
                        valid: Optional[jnp.ndarray] = None,
                        num_features: int = 36, conf_thresh: float = 0.0,
                        background: bool = False) -> Dict[str, jnp.ndarray]:
    """One image's bbox-feature selection (reference :80-129).

    proposals (P, 4) in input-image coords; cls_logits (P, n_cls) with
    background at column 0; feats (P, D); im_scale the resize factor.
    Returns features (N, D), boxes (N, 4) in ORIGINAL image coords,
    obj_id (N,), cls_prob (N,), num_boxes scalar (count of nonzero-conf
    keeps, reference's `num_boxes`).
    """
    scores = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    dets = proposals / im_scale
    start = 0 if background else 1
    fg = scores[:, start:]  # (P, C')

    keep = multiclass_nms_mask(dets, fg, 0.5, valid)  # (P, C')
    contrib = jnp.where(keep & (fg > conf_thresh), fg, 0.0)
    max_conf = contrib.max(axis=1)  # (P,)
    if valid is not None:
        max_conf = jnp.where(valid, max_conf, 0.0)

    top_conf, keep_boxes = jax.lax.top_k(max_conf, num_features)
    sel_scores = fg[keep_boxes]
    cls_prob = sel_scores.max(axis=1)
    obj_id = sel_scores.argmax(axis=1)
    return {
        "features": feats[keep_boxes],
        "boxes": dets[keep_boxes],
        "obj_id": obj_id.astype(jnp.int32),
        "cls_prob": cls_prob,
        "num_boxes": (top_conf != 0).sum().astype(jnp.int32),
    }
