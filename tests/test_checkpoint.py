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


def test_full_state_exact_resume():
    """save(full state) -> restore into a FRESH engine -> continue must
    be bit-identical to training straight through: Adam moments and the
    schedule position survive (the params-only path does not)."""
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.core.checkpoint import (
        is_full_state_tree, restore_train_state, train_state_to_tree,
    )
    from xlxmert_tpu.core.config import LxmertConfig, TrainConfig
    from xlxmert_tpu.tasks.pretrain import PretrainEngine
    from flax import serialization

    model_cfg = LxmertConfig(
        vocab_size=120, hidden_size=16, num_attention_heads=2,
        intermediate_size=32, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=8, num_qa_labels=5, num_clusters=7)
    cfg = TrainConfig(batch_size=8, grid_size=2, num_clusters=7,
                      max_text_length=6, mixed_precision=False)

    def make():
        eng = PretrainEngine(cfg, model_cfg=model_cfg, total_steps=8)
        return eng, eng.create_state(jax.random.PRNGKey(0))

    rng = jax.random.PRNGKey(1)
    r = np.random.RandomState(0)
    B, L, V = cfg.batch_size, cfg.max_text_length, cfg.n_grids
    centroids = jnp.asarray(r.randn(7, 8).astype(np.float32))

    eng, state = make()
    batch = eng.place({
        "word_id": r.randint(1, 120, (B, L)).astype(np.int32),
        "other_word_id": r.randint(1, 120, (B, L)).astype(np.int32),
        "matched_label": r.randint(0, 2, (B,)).astype(np.int32),
        "cluster_id": r.randint(0, 7, (B, V)).astype(np.int32),
    })

    def steps(eng, state, n, start):
        for i in range(start, start + n):
            state, _ = eng.train_step(eng.task_for_step(i))(
                state, batch, rng, centroids)
        return state

    ref = steps(eng, state, 4, 0)

    eng2, state2 = make()
    state2 = steps(eng2, state2, 2, 0)
    blob = serialization.to_bytes(
        jax.tree.map(np.asarray, train_state_to_tree(state2)))
    tree = serialization.msgpack_restore(blob)
    assert is_full_state_tree(tree)

    eng3, state3 = make()  # fresh engine: random params, zero opt state
    state3, saved_total = restore_train_state(state3, tree)
    assert saved_total is None  # not recorded in this blob
    assert int(np.asarray(state3.step)) == 2
    state3 = steps(eng3, state3, 2, 2)

    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(state3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref.opt_state),
                    jax.tree.leaves(state3.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gan_full_state_exact_resume():
    """restore_state on GanState: 2 (D,G) pairs + save/restore + 2 more
    == 4 straight pairs, bit-identical (discriminator, SN vectors, both
    optimizers, step all survive)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from xlxmert_tpu.core.checkpoint import restore_state
    from xlxmert_tpu.core.config import GanConfig
    from xlxmert_tpu.tasks.train_generator import GanEngine

    cfg = GanConfig(emb_dim=12, codebook_dim=8, g_base_dim=4, d_base_dim=4,
                    init_H=2, init_W=2, target_size=8, n_classes=5,
                    mixed_precision=False, batch_size=8)
    r = np.random.RandomState(3)
    centroids_np = r.randn(5, 12).astype(np.float32)
    cluster_id = r.randint(0, 5, (8, 4)).astype(np.int32)

    def make():
        eng = GanEngine(cfg)
        batch = eng.place({
            "image": np.tanh(r2.randn(8, 8, 8, 3)).astype(np.float32),
            "code": centroids_np[cluster_id].reshape(8, 2, 2, 12),
            "cluster_id": cluster_id,
        })
        return eng, batch

    r2 = np.random.RandomState(4)
    centroids = jnp.asarray(centroids_np)
    rng = jax.random.PRNGKey(7)

    def pairs(eng, state, batch, n, start):
        for i in range(start, start + n):
            state, _ = eng.d_step()(state, batch, centroids,
                                    jax.random.fold_in(rng, 2 * i))
            state, _ = eng.g_step()(state, batch, centroids,
                                    jax.random.fold_in(rng, 2 * i + 1))
        return state

    r2 = np.random.RandomState(4)
    eng, batch = make()
    ref = pairs(eng, eng.create_state(jax.random.PRNGKey(0), centroids),
                batch, 4, 0)

    r2 = np.random.RandomState(4)
    eng2, batch2 = make()
    st = pairs(eng2, eng2.create_state(jax.random.PRNGKey(0), centroids),
               batch2, 2, 0)
    blob = serialization.to_bytes(
        jax.tree.map(np.asarray, serialization.to_state_dict(st)))
    tree = serialization.msgpack_restore(blob)

    r2 = np.random.RandomState(4)
    eng3, batch3 = make()
    st3 = eng3.create_state(jax.random.PRNGKey(5), centroids)  # diverged
    st3, _ = restore_state(st3, tree)
    assert int(np.asarray(st3.step)) == int(np.asarray(st.step))
    st3 = pairs(eng3, st3, batch3, 2, 2)

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(st3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_params_reports_missing_and_unexpected():
    target = {"x": np.zeros(2), "y": {"z": np.zeros(3)}}
    loaded = {"x": np.ones(2), "extra": np.ones(1)}
    merged, missing, unexpected = merge_params(target, loaded)
    np.testing.assert_array_equal(merged["x"], np.ones(2))
    np.testing.assert_array_equal(merged["y"]["z"], np.zeros(3))
    assert missing == ["y"]
    assert unexpected == ["extra"]
