"""XLA NMS vs a straightforward numpy greedy reference."""
import numpy as np

import jax.numpy as jnp

from xlxmert_tpu.ops.nms import batched_class_nms, iou_matrix, nms


def np_iou(a, b):
    ix0 = max(a[0], b[0]); iy0 = max(a[1], b[1])
    ix1 = min(a[2], b[2]); iy1 = min(a[3], b[3])
    inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
    area = lambda x: max(x[2] - x[0], 0) * max(x[3] - x[1], 0)
    u = area(a) + area(b) - inter
    return inter / max(u, 1e-9)


def np_nms(boxes, scores, thr, max_out):
    order = list(np.argsort(-scores))
    keep = []
    while order and len(keep) < max_out:
        i = order.pop(0)
        keep.append(i)
        order = [j for j in order if np_iou(boxes[i], boxes[j]) <= thr]
    return keep


def random_boxes(n, seed):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2) * 80
    wh = rng.rand(n, 2) * 40 + 5
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


def test_iou_matrix():
    boxes, _ = random_boxes(20, 0)
    got = np.asarray(iou_matrix(jnp.asarray(boxes)))
    for i in range(20):
        for j in range(20):
            assert abs(got[i, j] - np_iou(boxes[i], boxes[j])) < 1e-5


def test_nms_matches_greedy_reference():
    for seed in range(5):
        boxes, scores = random_boxes(64, seed)
        idxs, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 36)
        got = list(np.asarray(idxs)[np.asarray(valid)])
        ref = np_nms(boxes, scores, 0.5, 36)
        assert got == ref, (seed, got, ref)


def test_batched_class_nms():
    boxes = np.stack([random_boxes(32, s)[0] for s in range(3)])
    scores = np.stack([random_boxes(32, s)[1] for s in range(3)])
    idxs, valid = batched_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    0.5, 10)
    assert idxs.shape == (3, 10) and valid.shape == (3, 10)
    for c in range(3):
        ref = np_nms(boxes[c], scores[c], 0.5, 10)
        got = list(np.asarray(idxs[c])[np.asarray(valid[c])])
        assert got == ref
