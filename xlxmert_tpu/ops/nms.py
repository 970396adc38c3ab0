"""XLA non-maximum suppression — the TPU building block for the
reference's bbox-feature path (the detector's per-class CUDA NMS at
feature_extraction/coco_extract_bbox_feature.py:91-129).

Shape-static formulation: iterate exactly `max_out` rounds inside a
`lax.fori_loop`; each round commits the highest-scoring live box and
suppresses its high-IoU neighbors. No data-dependent shapes, no host
sync — jit/vmap-able over classes and batch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1e9


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) xyxy -> (N, N) IoU."""
    x0, y0, x1, y1 = [boxes[:, i] for i in range(4)]
    area = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    inter = jnp.maximum(ix1 - ix0, 0) * jnp.maximum(iy1 - iy0, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float = 0.5,
        max_out: int = 36):
    """Greedy NMS. Returns (indices (max_out,), valid (max_out,) bool).

    Slots beyond the number of surviving boxes have valid=False (their
    index repeats the last committed box, keeping shapes static).
    """
    iou = iou_matrix(boxes)
    live = scores.astype(jnp.float32)

    def body(i, carry):
        live, idxs, valid = carry
        top = jnp.argmax(live)
        ok = live[top] > NEG / 2
        idxs = idxs.at[i].set(top)
        valid = valid.at[i].set(ok)
        # suppress the chosen box and its neighbors
        suppress = (iou[top] > iou_threshold) | (
            jnp.arange(live.shape[0]) == top)
        live = jnp.where(ok & suppress, NEG, live)
        return live, idxs, valid

    _, idxs, valid = jax.lax.fori_loop(
        0, max_out, body,
        (live, jnp.zeros((max_out,), jnp.int32),
         jnp.zeros((max_out,), bool)))
    return idxs, valid


def batched_class_nms(boxes, scores, iou_threshold=0.5, max_out=36):
    """Per-class NMS over (C, N, 4) boxes / (C, N) scores via vmap —
    the detector's per-class loop as one fused program."""
    return jax.vmap(lambda b, s: nms(b, s, iou_threshold, max_out))(
        boxes, scores)
