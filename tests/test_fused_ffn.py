"""Fused FFN kernel parity (interpret mode) vs the XLA formulation and vs
the flax Intermediate+FFOutput pair in serving mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlxmert_tpu.ops.ffn import fused_ffn, reference_ffn


def make(M=32, H=64, I=256, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(H, I).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(I).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(I, H).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.05)
    g = jnp.asarray(rng.rand(H).astype(np.float32) + 0.5)
    be = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    return x, w1, b1, w2, b2, g, be


@pytest.mark.parametrize("chunk", [256, 128, 64])
@pytest.mark.parametrize("approx", [True, False])
def test_fused_ffn_matches_reference(chunk, approx):
    args = make()
    got = fused_ffn(*args, approx_gelu=approx, chunk=chunk)
    ref = reference_ffn(*args, approx_gelu=approx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_ffn_leading_dims_and_odd_rows():
    x, w1, b1, w2, b2, g, be = make(M=24, H=64, I=128, seed=1)
    x3 = x.reshape(2, 12, 64)
    got = fused_ffn(x3, w1, b1, w2, b2, g, be, chunk=128)
    ref = reference_ffn(x3, w1, b1, w2, b2, g, be)
    assert got.shape == (2, 12, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_matches_flax_ffn_pair():
    """Same math as Intermediate -> FFOutput (serving mode, no dropout)."""
    import xlxmert_tpu.models.lxmert as L
    from xlxmert_tpu.core.config import LxmertConfig

    cfg = LxmertConfig(hidden_size=64, intermediate_size=256,
                       num_attention_heads=4)
    inter = L.Intermediate(cfg, dtype=jnp.float32)
    ffout = L.FFOutput(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 64)) * 0.5
    ip = inter.init(rng, x)["params"]
    h = inter.apply({"params": ip}, x)
    op = ffout.init(rng, h, x)["params"]

    try:
        L.serving_mode(True)  # tanh gelu
        h = inter.apply({"params": ip}, x)
        ref = ffout.apply({"params": op}, h, x, deterministic=True)
    finally:
        L.serving_mode(False)

    got = fused_ffn(
        x, ip["dense"]["kernel"], ip["dense"]["bias"],
        op["dense"]["kernel"], op["dense"]["bias"],
        op["LayerNorm"]["scale"], op["LayerNorm"]["bias"],
        approx_gelu=True, chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
