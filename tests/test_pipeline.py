"""Pipeline parallelism (parallel/pipeline.py): the microbatched
shard_map schedule over a (data, pipe) mesh must match the plain
sequential layer stack — forward AND reverse (grads through ppermute).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.models.lxmert import TransformerLayer, extend_attention_mask
from xlxmert_tpu.parallel.mesh import make_mesh
from xlxmert_tpu.parallel.pipeline import (
    pipeline_apply, place_pipeline, stack_language_layers, stack_layers,
)

CFG = LxmertConfig(vocab_size=64, hidden_size=16, num_attention_heads=2,
                   intermediate_size=32, l_layers=8, x_layers=1, r_layers=1,
                   visual_feat_dim=8, num_clusters=0)
L, B, T, H = 8, 8, 6, 16


def _setup():
    layer = TransformerLayer(CFG, jnp.float32)
    rngs = jax.random.split(jax.random.PRNGKey(0), L)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, H))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (B, T)) > 0.2)
    bias = extend_attention_mask(mask.astype(jnp.float32), jnp.float32)
    per_layer = [layer.init(r, x0, bias)["params"] for r in rngs]
    stacked = stack_layers(per_layer)

    def layer_fn(p1, carry):
        h, b = carry
        return layer.apply({"params": p1}, h, b, deterministic=True), b

    def sequential(stacked, h):
        def body(c, p1):
            return layer_fn(p1, c), None
        (h, _), _ = jax.lax.scan(body, (h, bias), stacked)
        return h

    return layer_fn, stacked, x0, bias, sequential


@pytest.mark.parametrize("shape,axes", [
    ((2, 4), ("data", "pipe")),   # dp x pp
    ((1, 8), ("data", "pipe")),   # pure pp, 1 layer per stage
])
def test_pipeline_matches_sequential(shape, axes):
    layer_fn, stacked, x0, bias, sequential = _setup()
    ref = sequential(stacked, x0)

    mesh = make_mesh(shape, axes)
    lp, (h, b) = place_pipeline(stacked, (x0, bias), mesh)
    out_h, _ = jax.jit(
        lambda lp, c: pipeline_apply(layer_fn, lp, c, mesh=mesh, n_micro=4)
    )(lp, (h, b))
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_stack_language_layers_path_contract():
    """stack_language_layers must index the real LxmertModel param tree
    (encoder/layer_{i}) — pins the path so a rename in models/lxmert.py
    fails here, and the stacked slices equal the per-layer subtrees."""
    from xlxmert_tpu.models.lxmert import LxmertModel
    from xlxmert_tpu.parallel.pipeline import stack_language_layers as sll

    model = LxmertModel(CFG, jnp.float32)
    B, T, V = 2, 4, CFG.visual_feat_dim
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((B, T), jnp.int32),
        jnp.zeros((B, 4, V)), jnp.zeros((B, 4, 4)),
        attention_mask=jnp.ones((B, T)))["params"]
    stacked = sll(params, CFG.l_layers)
    leaves = jax.tree.leaves(stacked)
    assert all(l.shape[0] == CFG.l_layers for l in leaves)
    for i in range(CFG.l_layers):
        sliced = jax.tree.map(lambda a: a[i], stacked)
        ref = params["encoder"][f"layer_{i}"]
        for a, b in zip(jax.tree.leaves(sliced), jax.tree.leaves(ref)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_grads_match_sequential():
    layer_fn, stacked, x0, bias, sequential = _setup()

    def ref_loss(stacked):
        return (sequential(stacked, x0) ** 2).mean()

    ref_grads = jax.grad(ref_loss)(stacked)

    mesh = make_mesh((2, 4), ("data", "pipe"))
    lp, c = place_pipeline(stacked, (x0, bias), mesh)

    def pipe_loss(lp):
        h, _ = pipeline_apply(layer_fn, lp, c, mesh=mesh, n_micro=2)
        return (h ** 2).mean()

    grads = jax.jit(jax.grad(pipe_loss))(lp)
    flat_ref = jax.tree.leaves(ref_grads)
    flat = jax.tree.leaves(grads)
    assert len(flat) == len(flat_ref)
    for g, gr in zip(flat, flat_ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   rtol=5e-4, atol=1e-6)
