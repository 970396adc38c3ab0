"""Int8 serving quantization primitives.

v5e's MXU runs int8 x int8 -> int32 at ~2.5x the measured bf16 rate
(287 vs 113 TOP/s on this chip, microbenchmarked with loop-carried data
dependence — beware XLA hoisting loop-invariant matmuls). Naive per-call
dynamic quantization erases the gain (measured 114 eff-TOP/s), so the
serving engine (serving/lxmert_int8.py) quantizes each activation ONCE
per site and shares it across fused projections (QKV as one matmul, KV as
one matmul).

Scheme: per-output-channel symmetric weight scales, per-row dynamic
activation scales, int32 accumulation, fp32 dequant.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class QuantWeight(NamedTuple):
    w_i8: jnp.ndarray  # (K, N) int8
    scale: jnp.ndarray  # (N,) fp32 per-output-channel
    bias: Optional[jnp.ndarray]  # (N,) fp32 or None
    # static-activation-scale mode (calibrated): set by apply_calibration.
    # inv_a = 1/a_scale (scalar), out_scale = a_scale * scale (N,) — the
    # dequant collapses to one fused multiply, and the quant to one
    # multiply+round that XLA fuses into the producing op's epilogue.
    inv_a: Optional[jnp.ndarray] = None
    out_scale: Optional[jnp.ndarray] = None


def quantize_weight(w: np.ndarray,
                    bias: Optional[np.ndarray] = None) -> QuantWeight:
    """(K, N) fp weight -> int8 + per-column (N,) scale (symmetric).
    Per-column only: the dequant epilogue multiplies the (M, N) matmul
    output by the (N,) scale row-wise — any other axis would need a
    different epilogue shape."""
    w = np.asarray(w, np.float32)
    scale = np.abs(w).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-8)
    w_i8 = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return QuantWeight(jnp.asarray(w_i8), jnp.asarray(scale),
                       None if bias is None else jnp.asarray(
                           np.asarray(bias, np.float32)))


def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., K) activation -> (int8 tensor, per-row fp32 scale (..., 1)).
    One pass; reuse the result across every matmul that consumes x."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    x_i8 = jnp.round(xf / s).astype(jnp.int8)
    return x_i8, s


def int8_matmul(x_i8: jnp.ndarray, s_x: jnp.ndarray, qw: QuantWeight,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """(..., K) int8 @ (K, N) int8 -> (..., N) dequantized."""
    acc = jax.lax.dot_general(
        x_i8, qw.w_i8, (((x_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * s_x * qw.scale
    if qw.bias is not None:
        out = out + qw.bias
    return out.astype(out_dtype)


def int8_dense(x: jnp.ndarray, qw: QuantWeight,
               out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Quantize-then-matmul for a single consumer (prefer quantize_rows +
    int8_matmul when several weights share x)."""
    x_i8, s_x = quantize_rows(x)
    return int8_matmul(x_i8, s_x, qw, out_dtype)


def with_activation_scale(qw: QuantWeight, a_max: float) -> QuantWeight:
    """Attach a calibrated static activation scale (per-tensor symmetric)
    to a weight: enables the static int8 path (no dynamic row-max pass)."""
    a_scale = max(float(a_max), 1e-8) / 127.0
    return qw._replace(
        inv_a=jnp.float32(1.0 / a_scale),
        out_scale=jnp.asarray(np.asarray(qw.scale) * a_scale))


def int8_dense_static(x: jnp.ndarray, qw: QuantWeight,
                      out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Static-scale int8 dense: quant is a fused multiply+round (no
    reduction), dequant one multiply in the matmul epilogue."""
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) * qw.inv_a),
                    -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8, qw.w_i8, (((x_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * qw.out_scale
    if qw.bias is not None:
        out = out + qw.bias
    return out.astype(out_dtype)


class ActScale(NamedTuple):
    """Calibrated static scale for a weightless int8 site (the attention
    score/context einsums). `key` is a tiny placeholder array whose
    identity keys the calibration dict, exactly like QuantWeight.w_i8
    keys the dense sites; `inv` (127/amax) and `scale` (amax/127) are
    attached by serving.lxmert_int8.apply_calibration."""
    key: jnp.ndarray
    inv: Optional[jnp.ndarray] = None
    scale: Optional[jnp.ndarray] = None

    @property
    def calibrated(self) -> bool:
        return self.inv is not None


def make_act_scale() -> ActScale:
    return ActScale(key=jnp.zeros((), jnp.float32))


def with_act_scale(s: ActScale, a_max: float) -> ActScale:
    a = max(float(a_max), 1e-8) / 127.0
    return s._replace(inv=jnp.float32(1.0 / a), scale=jnp.float32(a))


def quantize_static(x: jnp.ndarray, s: ActScale) -> jnp.ndarray:
    """bf16/fp32 -> int8 with a calibrated per-tensor scale (one fused
    multiply+round+clip, no reduction)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * s.inv),
                    -127, 127).astype(jnp.int8)
