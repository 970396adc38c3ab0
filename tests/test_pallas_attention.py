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


@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("Lq,Lk", [(20, 64), (64, 20), (64, 64)])
def test_mha_blhd_matches_einsum(with_bias, Lq, Lk):
    """BL(HD)-native kernel (round-5 serving lever): packed-head inputs,
    per-head VMEM slices — including the odd-head 64-lane offsets."""
    from xlxmert_tpu.ops.attention import mha_blhd

    rng = np.random.RandomState(2)
    B, H, D = 4, 12, 64
    q = jnp.asarray(rng.randn(B, Lq, H * D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, H * D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, H * D).astype(np.float32))
    bias = None
    if with_bias:
        m = np.zeros((B, Lk), np.float32)
        m[:, Lk - 5:] = -1e9
        bias = jnp.asarray(m)[:, None, None, :]  # engine _extend_mask shape
    out = mha_blhd(q, k, v, bias, H, fast=False)

    qh = q.reshape(B, Lq, H, D)
    kh = k.reshape(B, Lk, H, D)
    vh = v.reshape(B, Lk, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(D)
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, Lq, H * D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_int8_engine_pallas_blhd_core_agrees():
    """The serving engine with attention_impl('pallas_blhd') (interpret
    on CPU) agrees with its einsum core: identical math modulo bf16
    softmax accumulation order."""
    from xlxmert_tpu.serving import lxmert_int8 as engine

    rng = np.random.RandomState(3)
    B, Lq, Lk, H, D = 4, 20, 64, 4, 8
    q = jnp.asarray(rng.randn(B, Lq, H * D).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, Lk, H * D).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, Lk, H * D).astype(np.float32), jnp.bfloat16)
    m = np.ones((B, Lk), np.float32)
    m[:, Lk - 7:] = 0.0
    bias = engine._extend_mask(jnp.asarray(m))
    try:
        engine.attention_impl("einsum")
        ref = engine._attention_core(q, k, v, bias, H)
        engine.attention_impl("pallas_blhd")
        out = engine._attention_core(q, k, v, bias, H)
    finally:
        engine.attention_impl("auto")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05)  # bf16 softmax-order noise only
    # masked keys contributed nothing in both paths
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_pick_block_b_scoped_vmem_guard():
    """Empirical VMEM model from the bench-r5 B=512 OOM: the production
    sites must keep the measured-winning block 32 at B=256 (grid 8,
    single-buffered) and shrink to 16 at B=512 (grid>8 double-buffers
    the windows past the 16 MB scoped limit)."""
    from xlxmert_tpu.ops.attention import _pick_block_b

    HD, bf16 = 768, 2
    # visual self-attn 64x64: the site the B=512 compile OOMed on
    assert _pick_block_b(32, 256, 64, 64, HD, bf16) == 32
    assert _pick_block_b(32, 512, 64, 64, HD, bf16) == 16
    # cross-attn 20x64 doubles past the limit at B=512 too
    assert _pick_block_b(32, 512, 20, 64, HD, bf16) == 16
    # text self-attn 20x20 fits doubled
    assert _pick_block_b(32, 512, 20, 20, HD, bf16) == 32
    # small batches: block clamps to B, never zero
    assert _pick_block_b(32, 8, 64, 64, HD, bf16) == 8
    assert _pick_block_b(16, 3, 20, 20, HD, bf16) == 3
    # train kernel's dropout-mask window counts against the budget
    assert _pick_block_b(16, 256, 64, 64, HD, bf16,
                         extra_elems_per_bb=12 * 64 * 64) <= 16


@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("with_mask", [True, False])
def test_mha_blhd_train_fwd_matches_einsum(with_bias, with_mask):
    """Training BL(HD) kernel (interpret): forward parity vs the einsum
    reference it shares a backward with, incl. the dropout-mask operand."""
    from xlxmert_tpu.ops.attention import _blhd_einsum_ref, mha_blhd_train

    rng = np.random.RandomState(5)
    B, H, D, Lq, Lk = 4, 12, 64, 20, 64
    q = jnp.asarray(rng.randn(B, Lq, H * D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, H * D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, H * D).astype(np.float32))
    bias = None
    if with_bias:
        m = np.zeros((B, Lk), np.float32)
        m[:, Lk - 9:] = -1e9
        bias = jnp.asarray(m)[:, None, None, :]
    mask = None
    if with_mask:
        keep = jax.random.bernoulli(jax.random.PRNGKey(7), 0.9,
                                    (B, H, Lq, Lk))
        mask = keep.astype(jnp.float32) / 0.9
    out = mha_blhd_train(q, k, v, bias, mask, H, False)
    ref = _blhd_einsum_ref(q, k, v, bias, mask, H, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_mha_blhd_train_grads_match_einsum():
    """custom_vjp backward (einsum recompute with the saved mask) equals
    grad of the einsum reference — q/k/v cotangents, dropout mask on."""
    from xlxmert_tpu.ops.attention import _blhd_einsum_ref, mha_blhd_train

    rng = np.random.RandomState(6)
    B, H, D, Lq, Lk = 2, 4, 16, 8, 12
    q = jnp.asarray(rng.randn(B, Lq, H * D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, H * D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, H * D).astype(np.float32))
    m = np.zeros((B, Lk), np.float32)
    m[:, Lk - 3:] = -1e9
    bias = jnp.asarray(m)[:, None, None, :]
    keep = jax.random.bernoulli(jax.random.PRNGKey(8), 0.9, (B, H, Lq, Lk))
    mask = keep.astype(jnp.float32) / 0.9

    g = jax.grad(lambda q, k, v: (
        mha_blhd_train(q, k, v, bias, mask, H, False) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: (
        _blhd_einsum_ref(q, k, v, bias, mask, H, False) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_train_attention_mode_model_loss_and_grads():
    """Full backbone, training forward (deterministic=False) with
    train_attention_mode('pallas_blhd') vs 'xla': with dropout rates
    pinned to 0 the two formulations must agree in loss AND param grads
    (dropout>0 draws different-but-equally-distributed masks by design)."""
    cfg = LxmertConfig(
        vocab_size=100, hidden_size=32, num_attention_heads=4,
        intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=16, num_clusters=10,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    model = L.LxmertModel(cfg, dtype=jnp.float32)
    rng = np.random.RandomState(9)
    B, T, V = 2, 8, 9
    ids = jnp.asarray(rng.randint(1, 100, (B, T)).astype(np.int32))
    mask = np.ones((B, T), np.float32)
    mask[1, T - 2:] = 0.0
    mask = jnp.asarray(mask)
    feats = jnp.asarray(rng.randn(B, V, 16).astype(np.float32))
    pos = jnp.asarray(rng.rand(B, V, 4).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos,
                        attention_mask=mask)["params"]

    def loss(params):
        lang, vis, pooled = model.apply(
            {"params": params}, ids, feats, pos, attention_mask=mask,
            deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)})
        return (pooled ** 2).mean() + (lang ** 2).mean() + (vis ** 2).mean()

    try:
        L.train_attention_mode("xla")
        l0, g0 = jax.value_and_grad(loss)(params)
        L.train_attention_mode("pallas_blhd")
        l1, g1 = jax.value_and_grad(loss)(params)
    finally:
        L.train_attention_mode("xla")
    np.testing.assert_allclose(float(l0), float(l1), atol=1e-5, rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    assert flat0
    for path, a in flat0:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat1[path]), atol=1e-4, rtol=1e-4,
            err_msg=str(path))


def test_train_attention_dropout_mask_regularizes():
    """With dropout>0 the pallas_blhd train path must actually drop:
    two different dropout RNG keys give different outputs, and
    deterministic eval is unaffected by the toggle."""
    cfg = LxmertConfig(
        vocab_size=100, hidden_size=32, num_attention_heads=4,
        intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=16, num_clusters=10,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.5)
    model = L.LxmertModel(cfg, dtype=jnp.float32)
    rng = np.random.RandomState(10)
    B, T, V = 2, 8, 9
    ids = jnp.asarray(rng.randint(1, 100, (B, T)).astype(np.int32))
    feats = jnp.asarray(rng.randn(B, V, 16).astype(np.float32))
    pos = jnp.asarray(rng.rand(B, V, 4).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos)["params"]
    try:
        L.train_attention_mode("pallas_blhd")
        o1 = model.apply({"params": params}, ids, feats, pos,
                         deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1)})[2]
        o2 = model.apply({"params": params}, ids, feats, pos,
                         deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(2)})[2]
        e1 = model.apply({"params": params}, ids, feats, pos,
                         deterministic=True)[2]
        L.train_attention_mode("xla")
        e0 = model.apply({"params": params}, ids, feats, pos,
                         deterministic=True)[2]
    finally:
        L.train_attention_mode("xla")
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                               atol=0, rtol=0)


def test_serving_mode_pallas_blhd_model_parity():
    """Full backbone with attention='pallas_blhd' (round-5 layout-native
    kernel) vs exact mode, interpret on CPU."""
    cfg = LxmertConfig(
        vocab_size=100, hidden_size=32, num_attention_heads=4,
        intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=16, num_clusters=10)
    model = L.LxmertModel(cfg, dtype=jnp.float32)
    rng = np.random.RandomState(4)
    B, T, V = 2, 8, 9
    ids = jnp.asarray(rng.randint(1, 100, (B, T)).astype(np.int32))
    mask = np.ones((B, T), np.float32)
    mask[0, T - 3:] = 0.0
    mask = jnp.asarray(mask)
    feats = jnp.asarray(rng.randn(B, V, 16).astype(np.float32))
    pos = jnp.asarray(rng.rand(B, V, 4).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos,
                        attention_mask=mask)["params"]
    try:
        L.serving_mode(False)
        lang0, _, pooled0 = model.apply({"params": params}, ids, feats, pos,
                                        attention_mask=mask,
                                        deterministic=True)
        L.serving_mode(True, attention="pallas_blhd")
        lang1, _, pooled1 = model.apply({"params": params}, ids, feats, pos,
                                        attention_mask=mask,
                                        deterministic=True)
    finally:
        L.serving_mode(False)
    np.testing.assert_allclose(np.asarray(pooled0), np.asarray(pooled1),
                               atol=5e-3, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(lang0), np.asarray(lang1),
                               atol=5e-3, rtol=5e-3)
