"""Whole-block fused int8 transformer-layer Pallas kernel.

This is the "quantize once per layer input, chain matmuls in VMEM"
lever named in serving/lxmert_int8.py: one kernel runs the densest
serial chain of an encoder layer

    quant -> attn-out proj (int8 MXU) -> +residual -> LayerNorm
          -> FFN1 (int8) -> gelu -> FFN2 (int8) -> +residual
          -> LayerNorm -> [next module's QKV / q|kv (int8)]

over a block of rows, with every intermediate resident in VMEM and all
four weight matrices held in VMEM across grid steps (constant block
index -> fetched once). Compared with the XLA int8-static path
(serving/lxmert_int8.py) this removes the HBM round-trip of ~9 hidden
vectors per token per layer — per-sample intermediate traffic drops
from ~35 MB to the kernel inputs/outputs (~9 KB/token/layer), and the
VPU work (LN stats, gelu, quant rounds) is scheduled by Mosaic under
the MXU pipeline instead of running as separate XLA fusions between
matmuls.

Why this shape can win where the five earlier Pallas attempts lost
(ops/attention.py, ops/int8_matmul.py docstrings): those kernels fused
a single op and paid the quant/round-trip at their boundaries anyway;
attention tiles are (T<=84)-shaped and misaligned. Here every matmul is
(rows, 768) x (768, {768,2304,3072}) with rows = B*T flattened — all
dimensions are multiples of 128 — and fusion spans the whole serial
chain, so there is no boundary to pay at.

Numerics mirror serving/lxmert_int8.py exactly (bf16 matmul outputs,
bf16 residual adds, fp32 LN stats, bf16 tanh-gelu, static calibrated
activation scales baked in as compile-time constants); parity is pinned
in tests/test_fused_block.py.

MEASURED on TPU v5e (B=256, full 9/5/5 VQA forward, scan-chain timing,
scripts/drive_fused.py):
  int8 static XLA path              9776 q/s   <- still the champion
  fused whole-block, block_rows=256 8176 q/s
  fused whole-block, block_rows=128 7640 q/s
  fused whole-block, block_rows=512 compile OOM (VMEM)
The SIXTH Pallas-vs-XLA comparison on this model, and the most
favorable shape a kernel will ever get here (every dim a multiple of
128, whole serial chain fused, weights VMEM-resident) — and XLA still
wins by 20%. Conclusion recorded for future rounds: on this toolchain
XLA's int8 matmul pipelines + epilogue fusions are faster than Mosaic
codegen for this model family; the ~102 us/sample static path is 1.5x
the pure-matmul int8 roofline (~68 us at the microbenched 287 TOP/s),
and the measured Pallas alternatives sit further away, not closer. The
kernel stays as a correct, parity-tested, opt-in path.

Reference hot loop this serves: /root/reference/x-lxmert/src/tasks/
vqa.py:176-181 (batched VQA inference).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlxmert_tpu.ops.quant import QuantWeight

_F32 = jnp.float32
_BF16 = jnp.bfloat16


@jax.tree_util.register_pytree_node_class
class FusedWeight:
    """A calibrated int8 weight with its static activation scale pulled
    to the host. `inv_a` lives in the pytree's STATIC aux data so that it
    stays a python float under jit — the kernel bakes it in as a
    compile-time constant (params are fixed after calibration, so the
    one compilation per scale set is free)."""

    def __init__(self, w_i8, out_scale, bias, inv_a: float):
        self.w_i8 = w_i8            # (K, N) int8
        self.out_scale = out_scale  # (1, N) fp32 (= a_scale * col scale)
        self.bias = bias            # (1, N) fp32
        self.inv_a = inv_a          # python float: static 127/a_max

    def tree_flatten(self):
        return (self.w_i8, self.out_scale, self.bias), self.inv_a

    @classmethod
    def tree_unflatten(cls, inv_a, children):
        return cls(*children, inv_a)


def fused_weight(qw: QuantWeight) -> FusedWeight:
    """QuantWeight (calibrated: inv_a set) -> FusedWeight."""
    assert qw.inv_a is not None, "calibrate + apply_calibration first"
    n = qw.w_i8.shape[1]
    bias = qw.bias if qw.bias is not None else jnp.zeros((n,), _F32)
    return FusedWeight(qw.w_i8, qw.out_scale.reshape(1, n).astype(_F32),
                       bias.reshape(1, n).astype(_F32),
                       float(np.asarray(qw.inv_a)))


def concat_fused(a: QuantWeight, b: QuantWeight) -> FusedWeight:
    """Column-concat two calibrated weights that consume the SAME
    activation (e.g. cross-attention q and kv): one (K, Na+Nb) matmul."""
    fa, fb = fused_weight(a), fused_weight(b)
    assert fa.inv_a == fb.inv_a, (fa.inv_a, fb.inv_a)
    return FusedWeight(
        jnp.concatenate([fa.w_i8, fb.w_i8], axis=1),
        jnp.concatenate([fa.out_scale, fb.out_scale], axis=1),
        jnp.concatenate([fa.bias, fb.bias], axis=1),
        fa.inv_a)


def _quant(x, inv_a: float):
    return jnp.clip(jnp.round(x.astype(_F32) * _F32(inv_a)),
                    -127, 127).astype(jnp.int8)


def _mm(x_i8, w_ref, so_ref, b_ref):
    acc = jax.lax.dot_general(
        x_i8, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(_F32) * so_ref[0][None, :] + b_ref[0][None, :]


def _ln(h, g_ref, b_ref, eps=1e-12):
    hf = h.astype(_F32)
    mu = hf.mean(-1, keepdims=True)
    var = hf.var(-1, keepdims=True)
    out = ((hf - mu) * jax.lax.rsqrt(var + eps) * g_ref[0][None, :]
           + b_ref[0][None, :])
    return out.astype(_BF16)


def _make_kernel(inv_out: float, inv_1: float, inv_2: float,
                 inv_q: float, has_ffn: bool, has_tail: bool):
    """Kernel body closure; activation scales are compile-time consts."""

    def kernel(*refs):
        it = iter(refs)
        ctx_ref, x_ref = next(it), next(it)
        wo, so_o, b_o = next(it), next(it), next(it)
        g1, be1 = next(it), next(it)
        if has_ffn:
            w1, so_1, b_1 = next(it), next(it), next(it)
            w2, so_2, b_2 = next(it), next(it), next(it)
            g2, be2 = next(it), next(it)
        if has_tail:
            wq, so_q, b_q = next(it), next(it), next(it)
        y_ref = next(it)
        if has_tail:
            qkv_ref = next(it)

        out = _mm(_quant(ctx_ref[:], inv_out), wo, so_o, b_o)
        y1 = _ln(out.astype(_BF16) + x_ref[:], g1, be1)
        if has_ffn:
            a1 = _mm(_quant(y1, inv_1), w1, so_1, b_1)
            g = jax.nn.gelu(a1.astype(_BF16), approximate=True)
            a2 = _mm(_quant(g, inv_2), w2, so_2, b_2)
            y2 = _ln(a2.astype(_BF16) + y1, g2, be2)
        else:
            y2 = y1
        y_ref[:] = y2
        if has_tail:
            qkv_ref[:] = _mm(_quant(y2, inv_q), wq, so_q,
                             b_q).astype(_BF16)

    return kernel


def _rows_block(m: int, target: int) -> int:
    b = min(target, m)
    while b >= 128:
        if m % b == 0 and b % 128 == 0:
            return b
        b -= 128
    return m


def _const2d(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("has_ffn", "block_rows"))
def fused_block(ctx: jnp.ndarray, x: jnp.ndarray, out_w: FusedWeight,
                ln1_g, ln1_b,
                w1: Optional[FusedWeight] = None,
                w2: Optional[FusedWeight] = None,
                ln2_g=None, ln2_b=None,
                tail_w: Optional[FusedWeight] = None,
                has_ffn: bool = True,
                block_rows: int = 256):
    """Run the fused chain over rows.

    ctx: (..., H) attention context (pre out-projection), bf16.
    x:   (..., H) residual (the module input), bf16.
    Returns y (..., H) — and, when tail_w is given, (y, tail_out) where
    tail_out is the next module's fused projection (e.g. QKV), (..., Nq).
    """
    lead = ctx.shape[:-1]
    H = ctx.shape[-1]
    c2, x2 = ctx.reshape(-1, H), x.reshape(-1, H)
    M0 = c2.shape[0]
    # pad rows to a lane-friendly multiple so odd batch sizes can't force
    # a single whole-array VMEM block (zero rows LN to bias, harmless,
    # sliced off below)
    if M0 > 128 and M0 % 128:
        pad = 128 - M0 % 128
        c2 = jnp.concatenate([c2, jnp.zeros((pad, H), c2.dtype)], axis=0)
        x2 = jnp.concatenate([x2, jnp.zeros((pad, H), x2.dtype)], axis=0)
    M = c2.shape[0]
    R = _rows_block(M, block_rows)
    has_tail = tail_w is not None

    def row_spec(n):
        return pl.BlockSpec((R, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    inputs = [c2.astype(_BF16), x2.astype(_BF16),
              out_w.w_i8, out_w.out_scale, out_w.bias,
              ln1_g.reshape(1, H).astype(_F32),
              ln1_b.reshape(1, H).astype(_F32)]
    in_specs = [row_spec(H), row_spec(H),
                _const2d(out_w.w_i8.shape), _const2d(out_w.out_scale.shape),
                _const2d(out_w.bias.shape), _const2d((1, H)),
                _const2d((1, H))]
    flops = 2 * M * H * H
    if has_ffn:
        inputs += [w1.w_i8, w1.out_scale, w1.bias,
                   w2.w_i8, w2.out_scale, w2.bias,
                   ln2_g.reshape(1, H).astype(_F32),
                   ln2_b.reshape(1, H).astype(_F32)]
        in_specs += [_const2d(w1.w_i8.shape), _const2d(w1.out_scale.shape),
                     _const2d(w1.bias.shape), _const2d(w2.w_i8.shape),
                     _const2d(w2.out_scale.shape), _const2d(w2.bias.shape),
                     _const2d((1, H)), _const2d((1, H))]
        flops += 2 * M * H * w1.w_i8.shape[1] * 2
    if has_tail:
        inputs += [tail_w.w_i8, tail_w.out_scale, tail_w.bias]
        in_specs += [_const2d(tail_w.w_i8.shape),
                     _const2d(tail_w.out_scale.shape),
                     _const2d(tail_w.bias.shape)]
        flops += 2 * M * H * tail_w.w_i8.shape[1]

    out_shape = [jax.ShapeDtypeStruct((M, H), _BF16)]
    out_specs = [row_spec(H)]
    if has_tail:
        Nq = tail_w.w_i8.shape[1]
        out_shape.append(jax.ShapeDtypeStruct((M, Nq), _BF16))
        out_specs.append(row_spec(Nq))

    kernel = _make_kernel(
        out_w.inv_a,
        w1.inv_a if has_ffn else 1.0,
        w2.inv_a if has_ffn else 1.0,
        tail_w.inv_a if has_tail else 1.0,
        has_ffn, has_tail)

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(M // R,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=sum(int(np.prod(a.shape)) * a.dtype.itemsize
                               for a in inputs) + M * H * 2,
            transcendentals=M * (w1.w_i8.shape[1] if has_ffn else 0)),
        interpret=jax.devices()[0].platform == "cpu",
    )(*inputs)

    y = outs[0][:M0].reshape(*lead, H)
    if has_tail:
        return y, outs[1][:M0].reshape(*lead, tail_w.w_i8.shape[1])
    return y
