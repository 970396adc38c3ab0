"""Parity: whole-block fused Pallas path == static int8 engine.

The fused kernel (ops/fused_block.py) and forward (serving/lxmert_fused)
must reproduce the static-calibrated int8 engine's numerics — same
quant scales, same bf16 cast points, same LN/gelu math. On CPU the
kernel runs in interpreter mode, so this pins the math, not Mosaic
codegen (the TPU measurement lives in scripts/drive_fused.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.models.lxmert import LxmertModel
from xlxmert_tpu.ops.fused_block import (
    FusedWeight, concat_fused, fused_block, fused_weight,
)
from xlxmert_tpu.ops.quant import (
    int8_dense_static, quantize_weight, with_activation_scale,
)
from xlxmert_tpu.serving import lxmert_int8 as engine
from xlxmert_tpu.serving.lxmert_fused import lxmert_forward_fused, prepare_fused
from xlxmert_tpu.utils.boxes import box_position

CFG = LxmertConfig(
    vocab_size=97, hidden_size=32, num_attention_heads=4,
    intermediate_size=64, l_layers=2, x_layers=2, r_layers=1,
    visual_feat_dim=16, num_qa_labels=7)


def _mk_qw(rng, k, n, amax=3.0):
    w = rng.randn(k, n).astype(np.float32) * 0.2
    b = rng.randn(n).astype(np.float32) * 0.05
    return with_activation_scale(quantize_weight(w, b), amax)


def test_fused_block_matches_composed_ops():
    """Kernel output == the same chain composed from the engine's ops."""
    rng = np.random.RandomState(0)
    H, I, R = 32, 64, 16
    out_qw = _mk_qw(rng, H, H)
    w1_qw = _mk_qw(rng, H, I, amax=2.0)
    w2_qw = _mk_qw(rng, I, H, amax=4.0)
    tail_qw = _mk_qw(rng, H, 3 * H, amax=2.5)
    ln1 = {"scale": jnp.asarray(rng.rand(H).astype(np.float32) + 0.5),
           "bias": jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)}
    ln2 = {"scale": jnp.asarray(rng.rand(H).astype(np.float32) + 0.5),
           "bias": jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)}
    ctx = jnp.asarray(rng.randn(3, 5, H).astype(np.float32)).astype(
        jnp.bfloat16)
    x = jnp.asarray(rng.randn(3, 5, H).astype(np.float32)).astype(
        jnp.bfloat16)

    # reference: the engine's exact op sequence
    out = int8_dense_static(ctx, out_qw)
    y1 = engine.layer_norm(out + x, ln1)
    a1 = int8_dense_static(y1, w1_qw)
    g = jax.nn.gelu(a1, approximate=True)
    a2 = int8_dense_static(g, w2_qw)
    y2_ref = engine.layer_norm(a2 + y1, ln2)
    tail_ref = int8_dense_static(y2_ref, tail_qw)

    y2, tail = fused_block(
        ctx, x, fused_weight(out_qw), ln1["scale"], ln1["bias"],
        fused_weight(w1_qw), fused_weight(w2_qw), ln2["scale"],
        ln2["bias"], tail_w=fused_weight(tail_qw), has_ffn=True,
        block_rows=R)

    # bf16 compositions may differ by ~1 ulp from reduction-order
    # variation; pin to ulp-scale atol + tight cosine.
    def close(a, b, name):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.9999, (name, cos)
        np.testing.assert_allclose(a, b, atol=1e-1, rtol=0, err_msg=name)

    close(y2, y2_ref, "y2")
    close(tail, tail_ref, "tail")

    # no-FFN variant (cross-attention post block)
    y1_only = fused_block(ctx, x, fused_weight(out_qw), ln1["scale"],
                          ln1["bias"], has_ffn=False, block_rows=R)
    np.testing.assert_allclose(np.asarray(y1_only, np.float32),
                               np.asarray(y1, np.float32), atol=1e-1,
                               rtol=0)


def test_concat_fused_equals_two_matmuls():
    rng = np.random.RandomState(1)
    q = _mk_qw(rng, 32, 32, amax=2.0)
    kv = _mk_qw(rng, 32, 64, amax=2.0)
    cat = concat_fused(q, kv)
    assert isinstance(cat, FusedWeight)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    both = fused_block(  # use the tail path of a trivial block? no —
        # simpler: static dense on each and compare against the concat
        # weight applied via int8_dense_static-equivalent math.
        x, x, fused_weight(q), jnp.ones((32,)), jnp.zeros((32,)),
        has_ffn=False, block_rows=4)
    del both  # smoke only; the real check below
    a = np.asarray(int8_dense_static(x, q), np.float32)
    b = np.asarray(int8_dense_static(x, kv), np.float32)
    xi = jnp.clip(jnp.round(x * cat.inv_a), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xi, cat.w_i8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    full = np.asarray(
        (acc.astype(jnp.float32) * cat.out_scale + cat.bias).astype(
            jnp.bfloat16), np.float32)
    np.testing.assert_allclose(full[:, :32], a, atol=1e-2)
    np.testing.assert_allclose(full[:, 32:], b, atol=1e-2)


@pytest.fixture(scope="module")
def small_model():
    B, L, V = 4, 8, 9
    model = LxmertModel(CFG, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(np.random.RandomState(2).randint(1, 97, (B, L)),
                      jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)
    feats = jax.random.normal(rng, (B, V, CFG.visual_feat_dim)) * 0.5
    pos = jnp.asarray(
        np.random.RandomState(3).rand(B, V, 4).astype(np.float32))
    params = model.init(rng, ids, feats, pos, attention_mask=mask)["params"]
    return params, ids, feats, pos, mask


def test_fused_forward_matches_static_engine(small_model):
    params, ids, feats, pos, mask = small_model
    qp = engine.prepare_params(jax.tree.map(np.asarray, params), CFG)
    calib = engine.calibrate(
        qp, engine.prepare_answer_head(
            {"logit_fc_0": {"kernel": np.eye(CFG.hidden_size, 8,
                                             dtype=np.float32),
                            "bias": np.zeros(8, np.float32)},
             "logit_fc_2": {"scale": np.ones(8, np.float32),
                            "bias": np.zeros(8, np.float32)},
             "logit_fc_3": {"kernel": np.eye(8, 5, dtype=np.float32),
                            "bias": np.zeros(5, np.float32)}}),
        [(ids, feats, pos, mask)], CFG)
    sqp = engine.apply_calibration(qp, calib)

    lang_r, visn_r, pooled_r = jax.jit(
        lambda qp_, i, f, p, m: engine.lxmert_forward(
            qp_, i, f, p, attention_mask=m,
            n_heads=CFG.num_attention_heads))(sqp, ids, feats, pos, mask)

    fp = prepare_fused(sqp, CFG)
    lang_f, visn_f, pooled_f = lxmert_forward_fused(
        fp, ids, feats, pos, attention_mask=mask,
        n_heads=CFG.num_attention_heads, block_rows=16)

    for a, b, name in ((lang_r, lang_f, "lang"), (visn_r, visn_f, "visn"),
                       (pooled_r, pooled_f, "pooled")):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.999, (name, cos)
        np.testing.assert_allclose(a, b, atol=5e-2, rtol=0, err_msg=name)
