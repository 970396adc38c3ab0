"""Tensor-parallel (dp x tp) pretraining on the 8-device CPU mesh.

The reference's only strategy is DDP (SURVEY.md §2.4); the TPU-native
engine additionally supports a ("data", "model") mesh with
Megatron-style column/row param shardings (parallel/sharding.py).
These tests pin: shardings actually split the right axes, the train
step runs and matches the pure-DP run numerically, and param shardings
survive the update (no silent resharding drift)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tests.test_pretrain_engine import TINY, make_batch
from xlxmert_tpu.core.config import TrainConfig
from xlxmert_tpu.parallel.mesh import make_mesh
from xlxmert_tpu.parallel.sharding import lxmert_param_spec, param_shardings
from xlxmert_tpu.tasks.pretrain import PretrainEngine


def make_tp_engine():
    cfg = TrainConfig(batch_size=16, grid_size=4, num_clusters=24,
                      max_text_length=12, mixed_precision=False, lr=1e-3,
                      mesh_shape=(4, 2), mesh_axis_names=("data", "model"))
    return PretrainEngine(cfg, model_cfg=TINY, total_steps=100)


def test_spec_rules():
    class K:  # mimic jax tree path keys
        def __init__(self, key):
            self.key = key

    def spec(path, shape):
        return lxmert_param_spec([K(p) for p in path.split("/")],
                                 np.zeros(shape))

    assert spec("bert/encoder/layer_0/attention/self/query/kernel",
                (8, 8)) == P(None, "model")
    assert spec("bert/encoder/layer_0/attention/self/query/bias",
                (8,)) == P("model")
    assert spec("bert/encoder/layer_0/attention/output/dense/kernel",
                (8, 8)) == P("model", None)
    assert spec("bert/encoder/layer_0/attention/output/dense/bias",
                (8,)) == P()
    assert spec("bert/encoder/layer_0/intermediate/dense/kernel",
                (8, 16)) == P(None, "model")
    assert spec("bert/encoder/x_layers_0/lang_inter/dense/kernel",
                (8, 16)) == P(None, "model")
    assert spec("bert/encoder/x_layers_0/lang_output/dense/kernel",
                (16, 8)) == P("model", None)
    assert spec("bert/embeddings/word_embeddings/embedding",
                (40, 8)) == P()
    assert spec("bert/encoder/layer_0/attention/output/LayerNorm/scale",
                (8,)) == P()


def test_tp_state_is_sharded():
    eng = make_tp_engine()
    state = eng.create_state(jax.random.PRNGKey(0))
    qk = state.params["bert"]["encoder"]["layer_0"]["attention"]["self"][
        "query"]["kernel"]
    # column-sharded over the 2-way model axis: local shard is half-width
    assert qk.sharding.spec == P(None, "model")
    shard = qk.addressable_shards[0]
    assert shard.data.shape == (qk.shape[0], qk.shape[1] // 2)
    # optimizer state inherited the sharding
    mu = jax.tree.leaves(jax.tree.map(
        lambda x: x, state.opt_state, is_leaf=lambda x: hasattr(x, "sharding")))
    assert any(getattr(m, "sharding", None) is not None and
               m.sharding.spec == P(None, "model")
               for m in jax.tree.leaves(state.opt_state)
               if hasattr(m, "shape") and m.shape == qk.shape)


@pytest.mark.parametrize("task", ["word_mask", "vis_mask"])
def test_tp_step_matches_dp(task):
    # pure-DP engine (1-D mesh over all 8 devices)
    cfg_dp = TrainConfig(batch_size=16, grid_size=4, num_clusters=24,
                         max_text_length=12, mixed_precision=False, lr=1e-3)
    eng_dp = PretrainEngine(cfg_dp, model_cfg=TINY, total_steps=100)
    eng_tp = make_tp_engine()

    rng = jax.random.PRNGKey(0)
    state_dp = eng_dp.create_state(rng)
    state_tp = eng_tp.create_state(rng)
    centroids = jnp.asarray(
        np.random.RandomState(1).randn(24, 16).astype(np.float32))
    batch = make_batch(eng_dp.cfg)
    step_rng = jax.random.PRNGKey(42)

    s_dp, m_dp = eng_dp.train_step(task)(
        state_dp, eng_dp.place(batch), step_rng, centroids)
    s_tp, m_tp = eng_tp.train_step(task)(
        state_tp, eng_tp.place(batch), step_rng, centroids)

    np.testing.assert_allclose(float(m_dp["total_loss"]),
                               float(m_tp["total_loss"]), rtol=2e-5)
    # updated params agree (gather TP shards to host and compare)
    p_dp = jax.tree.map(np.asarray, s_dp.params)
    p_tp = jax.tree.map(np.asarray, s_tp.params)
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_tp)):
        np.testing.assert_allclose(a, b, atol=2e-5)

    # shardings survived the update
    qk = s_tp.params["bert"]["encoder"]["layer_0"]["attention"]["self"][
        "query"]["kernel"]
    assert qk.sharding.spec == P(None, "model")


def test_param_shardings_cover_tree():
    eng = make_tp_engine()
    params = eng.init_params(jax.random.PRNGKey(0))
    sh = param_shardings(params, eng.mesh)
    n_col = sum(1 for s in jax.tree.leaves(
        sh, is_leaf=lambda x: hasattr(x, "spec"))
        if s.spec == P(None, "model"))
    # 3 qkv + 1 intermediate per self-att'd layer, plus x-layer inters
    assert n_col >= 8
