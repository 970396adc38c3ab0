"""Fused-attention kernel parity (interpret mode on CPU) and the
serving-mode switch plumbing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import xlxmert_tpu.models.lxmert as L
from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.ops.attention import _einsum_mha, fused_mha


@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("fast", [True, False])
def test_fused_mha_matches_einsum(with_bias, fast):
    rng = np.random.RandomState(0)
    B, H, Lq, Lk, D = 3, 4, 20, 64, 16
    q = jnp.asarray(rng.randn(B, H, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32))
    bias = None
    if with_bias:
        b = np.zeros((B, Lk), np.float32)
        b[:, 50:] = -1e9
        bias = jnp.asarray(b)
    out = fused_mha(q, k, v, bias, fast)
    ref = _einsum_mha(q, k, v, bias, fast)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_mha_grads_flow():
    rng = np.random.RandomState(1)
    B, H, Lq, Lk, D = 2, 2, 8, 8, 8
    q = jnp.asarray(rng.randn(B, H, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32))

    def loss(q, k, v):
        return (fused_mha(q, k, v, None, False) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: (_einsum_mha(q, k, v, None, False) ** 2
                                   ).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_serving_mode_model_parity():
    """Full backbone with pallas serving mode vs exact mode: outputs agree
    to bf16-scale tolerance at fp32 compute."""
    cfg = LxmertConfig(
        vocab_size=100, hidden_size=32, num_attention_heads=4,
        intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=16, num_clusters=10)
    model = L.LxmertModel(cfg, dtype=jnp.float32)
    rng = np.random.RandomState(2)
    B, T, V = 2, 8, 9
    ids = jnp.asarray(rng.randint(1, 100, (B, T)).astype(np.int32))
    mask = jnp.asarray(np.ones((B, T), np.float32))
    feats = jnp.asarray(rng.randn(B, V, 16).astype(np.float32))
    pos = jnp.asarray(rng.rand(B, V, 4).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos,
                        attention_mask=mask)["params"]
    try:
        L.serving_mode(False)
        lang0, _, pooled0 = model.apply({"params": params}, ids, feats, pos,
                                        attention_mask=mask,
                                        deterministic=True)
        L.serving_mode(True)
        lang1, _, pooled1 = model.apply({"params": params}, ids, feats, pos,
                                        attention_mask=mask,
                                        deterministic=True)
    finally:
        L.serving_mode(False)
    np.testing.assert_allclose(np.asarray(pooled0), np.asarray(pooled1),
                               atol=5e-3, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(lang0), np.asarray(lang1),
                               atol=5e-3, rtol=5e-3)
