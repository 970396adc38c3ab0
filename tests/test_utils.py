"""Small utility coverage: profiling timer, mesh error paths, box utils."""
import time

import numpy as np
import pytest

from xlxmert_tpu.parallel.mesh import make_mesh, shard_batch
from xlxmert_tpu.utils.boxes import box_position, grid_view, original_view
from xlxmert_tpu.utils.profiling import StepTimer


def test_step_timer_summary():
    t = StepTimer(skip_first=1)
    for _ in range(4):
        with t:
            time.sleep(0.005)
    s = t.summary()
    assert s["n"] == 3
    # upper bound is generous: sleep() overshoots badly on a loaded host
    assert 0.004 < s["mean_s"] < 1.0
    assert s["steps_per_sec"] > 0


def test_shard_batch_divisibility_error():
    mesh = make_mesh()
    batch = {"x": np.zeros((6, 3), np.float32)}  # 6 % 8 != 0
    with pytest.raises(ValueError, match="divisible"):
        shard_batch(batch, mesh)


def test_shard_batch_ok():
    mesh = make_mesh()
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    out = shard_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert not out["x"].sharding.is_fully_replicated


def test_grid_view_roundtrip():
    x = np.arange(2 * 16 * 3, dtype=np.float32).reshape(2, 16, 3)
    g = grid_view(x, 4)
    assert g.shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(original_view(g), x)


def test_box_position_row_major():
    b = box_position(2)
    np.testing.assert_allclose(b, [[0, 0, .5, .5], [.5, 0, 1, .5],
                                   [0, .5, .5, 1], [.5, .5, 1, 1]])
