"""Grid-box position utilities (reference: x-lxmert/src/utils.py:75-85)."""
from __future__ import annotations

import numpy as np


def box_position(grid_size: int = 8) -> np.ndarray:
    """Normalized (x0, y0, x1, y1) boxes for every cell of a grid_size x
    grid_size grid, row-major — matches utils.py:75-85 exactly.

    Returns (grid_size**2, 4) float32 in [0, 1].
    """
    n_grids = grid_size ** 2
    boxes = np.zeros(shape=(n_grids, 4), dtype=np.float32)
    for i in range(grid_size):
        for j in range(grid_size):
            x0, x1 = j / grid_size, (j + 1) / grid_size
            y0, y1 = i / grid_size, (i + 1) / grid_size
            boxes[i * grid_size + j] = (x0, y0, x1, y1)
    return boxes


def grid_view(feats: np.ndarray, grid_size: int = 8) -> np.ndarray:
    """(..., G*G, D) -> (..., G, G, D) (image_generator/src/data_utils.py:19-46)."""
    return feats.reshape(*feats.shape[:-2], grid_size, grid_size, feats.shape[-1])


def original_view(feats: np.ndarray) -> np.ndarray:
    """(..., G, G, D) -> (..., G*G, D)."""
    g = feats.shape[-2]
    return feats.reshape(*feats.shape[:-3], g * g, feats.shape[-1])
