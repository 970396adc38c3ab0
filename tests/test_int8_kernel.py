"""Fused int8 matmul kernel parity (interpret mode)."""
import numpy as np

import jax.numpy as jnp

from xlxmert_tpu.ops.int8_matmul import int8_dense_fused, _pick_block
from xlxmert_tpu.ops.quant import quantize_weight


def test_pick_block():
    assert _pick_block(2304, 4096, 128) == 2304
    assert _pick_block(3129, 4096, 128) == 3129  # no divisor -> whole dim
    assert _pick_block(16384, 512, 8) == 512
    assert _pick_block(20, 512, 8) == 20


def test_fused_matches_reference():
    rng = np.random.RandomState(0)
    M, K, N = 64, 128, 256
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    w = rng.randn(K, N).astype(np.float32) * 0.1
    b = rng.randn(N).astype(np.float32)
    qw = quantize_weight(w, b)
    got = np.asarray(int8_dense_fused(x, qw.w_i8, qw.scale, qw.bias,
                                      out_dtype=jnp.float32), np.float32)
    # reference: same quantization math without the kernel
    xf = np.asarray(x)
    sx = np.maximum(np.abs(xf).max(1, keepdims=True) / 127.0, 1e-8)
    xi = np.round(xf / sx).astype(np.int32)
    ref = (xi @ np.asarray(qw.w_i8, np.int32)) * sx * np.asarray(qw.scale) \
        + b
    np.testing.assert_allclose(got, ref, atol=1e-2, rtol=1e-3)


def test_leading_dims_flattened():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 128).astype(np.float32))
    w = rng.randn(128, 256).astype(np.float32) * 0.1
    qw = quantize_weight(w, np.zeros(256, np.float32))
    out = int8_dense_fused(x, qw.w_i8, qw.scale, qw.bias)
    assert out.shape == (2, 8, 256)
