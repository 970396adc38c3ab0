"""Fused FFN block Pallas kernel: LN((W2 . gelu(W1 x + b1) + b2) + x).

Why: XLA fuses elementwise epilogues but never two matmuls — the
(rows, 3072) intermediate of every FFN round-trips HBM (write + read
~200MB per layer at B=256; ~4.6ms across the 19 LXRT layers). This kernel
chunks the intermediate dimension and accumulates W2 partial products in
a VMEM scratch, so the intermediate never leaves the chip.

Math is the serving-mode FFN (Intermediate -> FFOutput in
models/lxmert.py): gelu (exact erf or tanh approx), residual add with the
attention output, LayerNorm(1e-12) in fp32. Dropout-free (serving path).

Grid: (row_tiles, inter_chunks); the inter-chunk axis is the
fastest-varying, accumulating into a fp32 scratch that is initialized at
chunk 0 and finalized (bias + residual + LN) at the last chunk.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref, o_ref,
            acc_ref, *, n_chunks: int, approx_gelu: bool, eps: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    h = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + b1_ref[0][None, :]
    h = jax.nn.gelu(h, approximate=approx_gelu).astype(x.dtype)
    acc_ref[:] += jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_chunks - 1)
    def _finalize():
        y = acc_ref[:] + b2_ref[0][None, :] + x.astype(jnp.float32)
        mu = y.mean(axis=1, keepdims=True)
        var = ((y - mu) ** 2).mean(axis=1, keepdims=True)
        out = (y - mu) * jax.lax.rsqrt(var + eps)
        out = out * g_ref[0][None, :] + be_ref[0][None, :]
        o_ref[:] = out.astype(o_ref.dtype)


def _pick_rows(m: int, target: int = 512) -> int:
    b = min(target, m)
    while b >= 8:
        if m % b == 0 and b % 8 == 0:
            return b
        b -= 8
    return m


@functools.partial(jax.jit,
                   static_argnames=("approx_gelu", "eps", "chunk"))
def fused_ffn(x, w1, b1, w2, b2, ln_scale, ln_bias,
              approx_gelu: bool = True, eps: float = 1e-12,
              chunk: int = 768):
    """x (..., H); w1 (H, I); w2 (I, H). Returns LN(W2 gelu(W1 x) + x)."""
    lead = x.shape[:-1]
    H = x.shape[-1]
    I = w1.shape[1]
    x2 = x.reshape(-1, H)
    M = x2.shape[0]
    RM = _pick_rows(M)
    CN = chunk
    while I % CN:
        CN //= 2
    n_chunks = I // CN

    kern = functools.partial(_kernel, n_chunks=n_chunks,
                             approx_gelu=approx_gelu, eps=eps)
    row2 = lambda a: a.reshape(1, -1).astype(jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, H), x.dtype),
        grid=(M // RM, n_chunks),
        in_specs=[
            pl.BlockSpec((RM, H), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, CN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CN, H), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RM, H), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((RM, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * M * H * I,
            bytes_accessed=(x2.size + 2 * H * I) * 2 + M * H * 2,
            transcendentals=M * I),
        interpret=jax.devices()[0].platform == "cpu",
    )(x2, w1.astype(x.dtype), row2(b1), w2.astype(x.dtype), row2(b2),
      row2(ln_scale), row2(ln_bias))
    return out.reshape(*lead, H)


def reference_ffn(x, w1, b1, w2, b2, ln_scale, ln_bias,
                  approx_gelu: bool = True, eps: float = 1e-12):
    """Unfused XLA formulation (the exact math the kernel implements)."""
    h = jnp.dot(x, w1.astype(x.dtype),
                preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=approx_gelu).astype(x.dtype)
    y = jnp.dot(h, w2.astype(x.dtype),
                preferred_element_type=jnp.float32) + b2
    y = y + x.astype(jnp.float32)
    mu = y.mean(axis=-1, keepdims=True)
    var = ((y - mu) ** 2).mean(axis=-1, keepdims=True)
    out = (y - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    return out.astype(x.dtype)
