"""Host-side IO: grid-feature HDF5 readers, json corpora, cluster maps.

File contracts (the reference's real inter-layer API, SURVEY.md §1):
  - `<encoder>_<split>_grid<g>.h5`: f[img_id]['features'] = (g, g, 2048)
    (coco_extract_grid_feature.py:233-260)
  - centroid `.npy`: (n_centroids, 2048) (run_kmeans.py:107-113)
  - `img_id_to_cluster_id` `.pkl`: {img_id: (g*g,) int} (run_kmeans.py:153-166)
  - task jsons under data/{vqa,gqa,nlvr2,lxmert}/ (vqa_data.py:40-56 etc.)

h5py stays on the host path (it is IO, not device code); readers add an
optional in-memory cache and batched reads so the device never waits on
random single-sample h5 access (SURVEY.md §7 input-pipeline hard part).
"""
from __future__ import annotations

import json
import pickle
import threading
from typing import Dict, List, Optional

import numpy as np


def load_json(path) -> object:
    with open(path) as f:
        return json.load(f)


def load_pickle(path) -> object:
    with open(path, "rb") as f:
        return pickle.load(f)


class GridFeatureReader:
    """Random access to `f[img_id]['features']` grid features.

    cache="ram" loads each requested feature once and keeps it (the working
    sets — COCO/VG 8x8x2048 fp32 — fit host RAM on production machines);
    cache=None reads through. Thread-safe.
    """

    def __init__(self, path, cache: Optional[str] = "ram"):
        import h5py

        self.path = str(path)
        self._f = h5py.File(self.path, "r")
        self._cache: Optional[Dict[str, np.ndarray]] = (
            {} if cache == "ram" else None)
        self._lock = threading.Lock()

    def keys(self) -> List[str]:
        return list(self._f.keys())

    def __contains__(self, img_id) -> bool:
        return str(img_id) in self._f

    def get(self, img_id) -> np.ndarray:
        img_id = str(img_id)
        if self._cache is not None:
            hit = self._cache.get(img_id)
            if hit is not None:
                return hit
        with self._lock:
            feat = np.asarray(self._f[img_id]["features"], np.float32)
        if self._cache is not None:
            self._cache[img_id] = feat
        return feat

    def get_batch(self, img_ids, out: Optional[np.ndarray] = None
                  ) -> np.ndarray:
        # preallocate + per-row contiguous copies: np.stack's gather path
        # measures ~0.17 GB/s on single-core serving hosts vs ~5 GB/s for
        # row copies (each row is one contiguous 512 KB memcpy). `out`
        # lets a steady-state loop reuse one pinned buffer.
        first = self.get(img_ids[0])
        if out is None:
            out = np.empty((len(img_ids),) + first.shape, first.dtype)
        out[0] = first
        for j, i in enumerate(img_ids[1:], start=1):
            out[j] = self.get(i)
        return out

    def close(self):
        self._f.close()


class BboxFeatureReader:
    """Random access to the C17 bbox-extractor h5
    (`maskrcnn_*_boxes36.h5`: per-image features (n_boxes, 2048),
    obj_id (n_boxes,), boxes (n_boxes, 4) in pixels, img_w/img_h —
    cli/extract_bbox_features.py, reference
    coco_extract_bbox_feature.py:296-335).

    `get` returns {features, obj_id, boxes} with boxes normalized to
    [0, 1] by image size and clamped, exactly like the reference
    pretraining loader (lxmert_data.py:310-325). Thread-safe; cache="ram"
    keeps each decoded image after first read."""

    def __init__(self, path, cache: Optional[str] = "ram"):
        import h5py

        self.path = str(path)
        self._f = h5py.File(self.path, "r")
        self._cache: Optional[Dict[str, dict]] = {} if cache == "ram" else None
        self._lock = threading.Lock()

    def keys(self) -> List[str]:
        return list(self._f.keys())

    def __contains__(self, img_id) -> bool:
        return str(img_id) in self._f

    def get(self, img_id) -> dict:
        img_id = str(img_id)
        if self._cache is not None:
            hit = self._cache.get(img_id)
            if hit is not None:
                return hit
        with self._lock:
            g = self._f[img_id]
            feats = np.asarray(g["features"], np.float32)
            obj_id = np.asarray(g["obj_id"], np.int32)
            boxes = np.asarray(g["boxes"], np.float32)
            img_w = float(np.asarray(g["img_w"]))
            img_h = float(np.asarray(g["img_h"]))
        boxes = boxes.copy()
        boxes[:, (0, 2)] /= img_w
        boxes[:, (1, 3)] /= img_h
        np.clip(boxes, 0.0, 1.0, out=boxes)
        out = {"features": feats, "obj_id": obj_id, "boxes": boxes}
        if self._cache is not None:
            self._cache[img_id] = out
        return out

    def close(self):
        self._f.close()


class ClusterMap:
    """img_id -> (n_grids,) cluster ids, from the kmeans pkl."""

    def __init__(self, path):
        self.map = load_pickle(path)

    def __contains__(self, img_id):
        return img_id in self.map

    def get(self, img_id) -> np.ndarray:
        return np.asarray(self.map[img_id], np.int32).reshape(-1)

    def get_batch(self, img_ids) -> np.ndarray:
        return np.stack([self.get(i) for i in img_ids])


class PrefetchLoader:
    """Wrap a batch-producing iterable with a background prefetch thread —
    the torch DataLoader worker-pool equivalent, sized for feeding one
    SPMD program rather than per-rank processes."""

    def __init__(self, it_factory, depth: int = 4):
        self.it_factory = it_factory
        self.depth = depth

    def __iter__(self):
        import queue

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        DONE = object()
        err: list = []

        def worker():
            try:
                for item in self.it_factory():
                    q.put(item)
            except BaseException as e:  # re-raised on the consumer thread
                err.append(e)
            finally:
                q.put(DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                # a worker error must NOT look like end-of-epoch — that
                # would silently truncate training to however many
                # batches preceded the failure
                if err:
                    raise err[0]
                break
            yield item
