"""core/checkpoint.py: atomic writes, async checkpointer semantics,
merge_params overlay."""
import os

import numpy as np
import pytest

from xlxmert_tpu.core.checkpoint import (
    AsyncCheckpointer, load_pytree, merge_params, save_pytree,
)

TREE = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "b": {"c": np.asarray([1.5, -2.0], np.float32)}}


def _assert_tree(loaded):
    np.testing.assert_array_equal(loaded["a"], TREE["a"])
    np.testing.assert_array_equal(loaded["b"]["c"], TREE["b"]["c"])


def test_save_is_atomic_no_tmp_left(tmp_path):
    path = str(tmp_path / "ck.msgpack")
    save_pytree(TREE, path)
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")
    _assert_tree(load_pytree(path))


def test_save_overwrites_existing_atomically(tmp_path):
    path = str(tmp_path / "ck.msgpack")
    save_pytree({"a": np.zeros((1,), np.float32)}, path)
    save_pytree(TREE, path)
    _assert_tree(load_pytree(path))


def test_async_checkpointer_roundtrip(tmp_path):
    ck = AsyncCheckpointer()
    path = str(tmp_path / "async.msgpack")
    ck.save(TREE, path)
    ck.wait()
    _assert_tree(load_pytree(path))


def test_async_checkpointer_snapshot_taken_at_save_time(tmp_path):
    """The host snapshot is taken synchronously in save() — mutating
    (or invalidating) the source after save() must not affect the
    written checkpoint. This is the donation-safety contract."""
    ck = AsyncCheckpointer()
    src = {"a": TREE["a"].copy()}
    path = str(tmp_path / "snap.msgpack")
    ck.save(src, path)
    src["a"][:] = -1.0  # simulate the buffer being reused
    ck.wait()
    np.testing.assert_array_equal(load_pytree(path)["a"], TREE["a"])


def test_async_checkpointer_error_surfaces_on_wait(tmp_path):
    ck = AsyncCheckpointer()
    bad_dir = tmp_path / "f"
    bad_dir.write_text("not a directory")
    with pytest.raises(OSError):
        ck.save(TREE, str(bad_dir / "x" / "ck.msgpack"))
        ck.wait()
    # the checkpointer is reusable after an error
    good = str(tmp_path / "ok.msgpack")
    ck.save(TREE, good)
    ck.wait()
    _assert_tree(load_pytree(good))


def test_merge_params_reports_missing_and_unexpected():
    target = {"x": np.zeros(2), "y": {"z": np.zeros(3)}}
    loaded = {"x": np.ones(2), "extra": np.ones(1)}
    merged, missing, unexpected = merge_params(target, loaded)
    np.testing.assert_array_equal(merged["x"], np.ones(2))
    np.testing.assert_array_equal(merged["y"]["z"], np.zeros(3))
    assert missing == ["y"]
    assert unexpected == ["extra"]
