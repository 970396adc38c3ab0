"""Pallas fused multi-head attention for the LXRT block shapes.

The LXRT encoder runs 19 attention ops per forward over tiny sequences
(20 text / 64 visual tokens, 12 heads, head_dim 64). XLA materializes the
(B, 12, L, L) score/prob tensors in HBM between the batched matmul,
softmax, and context ops; at B=256 that is ~70MB of round-trip traffic per
attention. This kernel keeps the whole head loop — scores, additive bias,
softmax, context — in VMEM, one batch element per program.

Usable on the serving path (no dropout). The backward pass falls back to
the einsum formulation via jax.custom_vjp (attention FLOPs are negligible;
the candidate win is inference HBM traffic). Numerics: MXU accumulation is
fp32 (Mosaic requirement); `fast` lowers only the softmax dtype, matching
models/lxmert.py's FAST_SOFTMAX semantics.

MEASURED on TPU v5e (B=256, bf16, full 9/5/5 model): XLA einsum path
8547 q/s vs this kernel 8092 q/s (batch-block 16) / 7399 q/s (block 1) —
XLA's batched-matmul + fusion wins at these tiny L in {20, 64}, D=64
shapes, so `serving_mode()` defaults attention to "xla" and this kernel
stays opt-in (`serving_mode(True, attention="pallas")`). Revisit with a
head-packed layout if shapes grow.

See /opt/skills/guides/pallas_guide.md for the kernel-authoring rules
followed here (static shapes, VMEM blocks, fp32 MXU accumulation).
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads: int,
                scale: float, acc_dtype):
    """One batch block: q (BB, H, Lq, D), k/v (BB, H, Lk, D),
    bias (BB, 1, Lk) additive or None, o (BB, H, Lq, D).

    Per head, a batched dot over the BB block — fewer, larger MXU ops
    than per-(batch, head) dots. MXU accumulation is always 32-bit
    (Mosaic requirement); `fast` only lowers the softmax dtype.
    """
    bias = None
    if bias_ref is not None:
        bias = bias_ref[:, 0, :].astype(acc_dtype)  # (BB, Lk)
    for h in range(n_heads):
        q = q_ref[:, h]  # (BB, Lq, D)
        k = k_ref[:, h]  # (BB, Lk, D)
        v = v_ref[:, h]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (BB, Lq, Lk)
        s = (s * scale).astype(acc_dtype)
        if bias is not None:
            s = s + bias[:, None, :]
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o_ref[:, h] = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _fused_mha_fwd(q, k, v, bias, fast: bool, block_b: int = 16):
    """q/k/v: (B, H, L*, D). bias: (B, Lk) additive or None."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    BB = min(block_b, B)
    while B % BB:
        BB //= 2
    acc = q.dtype if fast else jnp.float32
    kern = functools.partial(_mha_kernel, n_heads=H,
                             scale=float(1.0 / np.sqrt(D)), acc_dtype=acc)
    in_specs = [
        pl.BlockSpec((BB, H, Lq, D), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BB, H, Lk, D), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BB, H, Lk, D), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((BB, 1, Lk), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(B, 1, Lk))
    else:
        def kern(q_ref, k_ref, v_ref, o_ref):
            _mha_kernel(q_ref, k_ref, v_ref, None, o_ref, n_heads=H,
                        scale=float(1.0 / np.sqrt(D)), acc_dtype=acc)

    # CPU (tests / virtual mesh) runs the kernel interpreted
    interpret = jax.devices()[0].platform == "cpu"
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
        grid=(B // BB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BB, H, Lq, D), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Lq * Lk * D,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Lq * Lk),
        interpret=interpret,
    )(*args)


def _einsum_mha(q, k, v, bias, fast: bool):
    """Reference einsum formulation (used for grads and as fallback)."""
    acc = q.dtype if fast else jnp.float32
    D = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=acc)
    s = s * jnp.asarray(1.0 / np.sqrt(D), acc)
    if bias is not None:
        s = s + bias[:, None, None, :].astype(acc)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_mha(q, k, v, bias, fast: bool = False):
    """Fused attention: q/k/v (B, H, L*, D), optional additive bias (B, Lk).
    Returns (B, H, Lq, D)."""
    return _fused_mha_fwd(q, k, v, bias, fast)


def _vjp_fwd(q, k, v, bias, fast):
    return _fused_mha_fwd(q, k, v, bias, fast), (q, k, v, bias)


def _vjp_bwd(fast, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q, k, v, b: _einsum_mha(q, k, v, b, fast),
                     q, k, v, bias)
    return vjp(g)


fused_mha.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# BL(HD)-native fused MHA — no head transpose in HBM
# ---------------------------------------------------------------------------
#
# Round-5 trace attribution of the int8 serving engine (scripts/
# drive_serving_trace.py) showed ~30 us/sample (30% of device time at
# B=256) spent on pure layout copies: XLA physically transposes
# (B, L, H, D) <-> (B, H, L, D) around every "bhqk" attention einsum —
# 3 copies in + 1 out x 34 attention sites. Every previous Pallas
# attention experiment (fused_mha above, the fused-block kernel) took
# (B, H, L, D) operands, so those HBM transposes sat OUTSIDE the kernel
# in both arms of each comparison. This kernel instead consumes q/k/v in
# the (B, L, H*D) layout the QKV projection produces and writes context
# back in the same layout; the per-head column slicing happens in VMEM
# where it costs lane shifts, not HBM round-trips.


def _mha_blhd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                     n_heads: int, scale: float, acc_dtype,
                     mask_ref=None):
    """One batch block: q (BB, Lq, H*D), k/v (BB, Lk, H*D),
    bias (BB, 1, Lk) additive or None, optional pre-scaled dropout
    mask (BB, H, Lq, Lk), o (BB, Lq, H*D)."""
    D = q_ref.shape[-1] // n_heads
    bias = None
    if bias_ref is not None:
        bias = bias_ref[:, 0, :].astype(acc_dtype)  # (BB, Lk)
    for h in range(n_heads):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, :, sl]  # (BB, Lq, D)
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (BB, Lq, Lk)
        s = (s * scale).astype(acc_dtype)
        if bias is not None:
            s = s + bias[:, None, :]
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        if mask_ref is not None:
            p = p * mask_ref[:, h]
        o_ref[:, :, sl] = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


_SCOPED_VMEM_BUDGET = 14 * 2 ** 20  # 16 MB limit minus temp headroom


def _pick_block_b(block_b: int, B: int, Lq: int, Lk: int, HD: int,
                  itemsize: int, extra_elems_per_bb: int = 0) -> int:
    """Largest feasible batch block <= block_b under the scoped-VMEM
    limit. Empirical model (bench r5 B=512 OOM): the q/k/v/o windows
    cost BB*HD*2*(Lq+Lk)*itemsize bytes, and Mosaic DOUBLE-buffers them
    once the grid exceeds 8 steps — so B=256/BB=32 (grid 8, 12.6 MB
    single-buffered) compiles and wins while B=512/BB=32 (grid 16,
    25 MB) is rejected with 'scoped allocation 24.00M > 16.00M'."""
    BB = min(block_b, B)
    while B % BB:
        BB //= 2
    while BB > 1:
        window = BB * (HD * 2 * (Lq + Lk) + extra_elems_per_bb) * itemsize
        if window * (2 if B // BB > 8 else 1) <= _SCOPED_VMEM_BUDGET:
            break
        BB //= 2
        while B % BB:
            BB //= 2
    return BB


def mha_blhd(q, k, v, bias, n_heads: int, fast: bool = True,
             block_b: int = 32):
    """Fused attention over packed heads: q (B, Lq, H*D), k/v
    (B, Lk, H*D), optional additive bias (B, 1, 1, Lk) (the serving
    engine's _extend_mask shape) or (B, Lk). Returns (B, Lq, H*D) — the
    same layout the out-projection consumes, so XLA inserts no
    head-split transposes. Serving-path only (no vjp).

    block_b default from the round-5 chip sweep
    (scripts/drive_attention_layout.py, B=256 int8 engine, L=20):
    block 16 = 12,600 q/s, block 32 = 12,970 (+2.9%, bit-exact logits),
    block 64 = VMEM OOM at the B,Lq=64 visual self-attn site. The
    requested block is a CAP — _pick_block_b shrinks it per call-site
    shape so large batches (B>=512, where Mosaic double-buffers the
    windows) stay under the 16 MB scoped-vmem limit."""
    B, Lq, HD = q.shape
    Lk = k.shape[1]
    D = HD // n_heads
    BB = _pick_block_b(block_b, B, Lq, Lk, HD, q.dtype.itemsize)
    acc = q.dtype if fast else jnp.float32
    in_specs = [
        pl.BlockSpec((BB, Lq, HD), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BB, Lk, HD), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BB, Lk, HD), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        bias = bias.reshape(B, 1, Lk)
        in_specs.append(pl.BlockSpec((BB, 1, Lk), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
        kern = functools.partial(_mha_blhd_kernel, n_heads=n_heads,
                                 scale=float(1.0 / np.sqrt(D)),
                                 acc_dtype=acc)
    else:
        def kern(q_ref, k_ref, v_ref, o_ref):
            _mha_blhd_kernel(q_ref, k_ref, v_ref, None, o_ref,
                             n_heads=n_heads,
                             scale=float(1.0 / np.sqrt(D)), acc_dtype=acc)

    interpret = jax.devices()[0].platform == "cpu"
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
        grid=(B // BB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BB, Lq, HD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * n_heads * Lq * Lk * D,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * n_heads * Lq * Lk),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Training-path BL(HD) attention: Pallas forward, einsum-recompute backward
# ---------------------------------------------------------------------------
#
# The serving trace showed the (B,L,H*D) <-> (B,H,L,D) transpose copies
# exist on the training forward too (same Attention module, same einsum
# formulation — models/lxmert.py). The serving kernel above can't run
# there because attention-prob dropout lives INSIDE the formulation. This
# variant takes the dropout mask as a kernel OPERAND (pre-scaled
# keep/keep_prob, drawn from the module's flax RNG exactly like
# nn.Dropout would), so the forward stays layout-native; the backward is
# jax.custom_vjp over an einsum recompute that applies the SAME mask
# tensor — exact gradients, and the (B,H,Lq,Lk) probs are rematerialized
# instead of stored (flash-attention-style residual saving: q/k/v/mask).


def _blhd_einsum_ref(q, k, v, bias, mask, n_heads: int, fast: bool):
    """Einsum reference of the BL(HD) train op (used for the backward
    recompute and interpret-mode parity). q (B, Lq, H*D), k/v
    (B, Lk, H*D), bias additive (B, Lk) or (B, 1, 1, Lk) or None,
    mask pre-scaled (B, H, Lq, Lk) or None."""
    B, Lq, HD = q.shape
    Lk = k.shape[1]
    D = HD // n_heads
    acc = q.dtype if fast else jnp.float32
    qh = q.reshape(B, Lq, n_heads, D)
    kh = k.reshape(B, Lk, n_heads, D)
    vh = v.reshape(B, Lk, n_heads, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=acc)
    s = s * jnp.asarray(1.0 / np.sqrt(D), acc)
    if bias is not None:
        s = s + bias.reshape(B, 1, 1, Lk).astype(acc)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    if mask is not None:
        p = p * mask
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return ctx.reshape(B, Lq, HD)


def _mha_blhd_train_fwd(q, k, v, bias, mask, n_heads: int, fast: bool,
                        block_b: int):
    B, Lq, HD = q.shape
    Lk = k.shape[1]
    D = HD // n_heads
    BB = _pick_block_b(block_b, B, Lq, Lk, HD, q.dtype.itemsize,
                       extra_elems_per_bb=(
                           n_heads * Lq * Lk if mask is not None else 0))
    acc = q.dtype if fast else jnp.float32
    in_specs = [
        pl.BlockSpec((BB, Lq, HD), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BB, Lk, HD), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BB, Lk, HD), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((BB, 1, Lk), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(B, 1, Lk))
    if mask is not None:
        in_specs.append(pl.BlockSpec((BB, n_heads, Lq, Lk),
                                     lambda b: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask.astype(q.dtype))

    base = functools.partial(_mha_blhd_kernel, n_heads=n_heads,
                             scale=float(1.0 / np.sqrt(D)), acc_dtype=acc)
    if bias is not None and mask is not None:
        def kern(q_ref, k_ref, v_ref, b_ref, m_ref, o_ref):
            base(q_ref, k_ref, v_ref, b_ref, o_ref, mask_ref=m_ref)
    elif bias is not None:
        def kern(q_ref, k_ref, v_ref, b_ref, o_ref):
            base(q_ref, k_ref, v_ref, b_ref, o_ref)
    elif mask is not None:
        def kern(q_ref, k_ref, v_ref, m_ref, o_ref):
            base(q_ref, k_ref, v_ref, None, o_ref, mask_ref=m_ref)
    else:
        def kern(q_ref, k_ref, v_ref, o_ref):
            base(q_ref, k_ref, v_ref, None, o_ref)

    interpret = jax.devices()[0].platform == "cpu"
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
        grid=(B // BB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BB, Lq, HD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * n_heads * Lq * Lk * D,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * n_heads * Lq * Lk),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def mha_blhd_train(q, k, v, bias, dropout_mask, n_heads: int,
                   fast: bool = False, block_b: int = 16):
    """Differentiable BL(HD) fused attention for the training path.

    q (B, Lq, H*D), k/v (B, Lk, H*D), bias additive (B, 1, 1, Lk) or
    None, dropout_mask pre-scaled keep/keep_prob (B, H, Lq, Lk) or None.
    Forward runs the layout-native Pallas kernel (mask applied to the
    softmax probs in VMEM); backward recomputes via the einsum
    formulation with the SAME saved mask (exact grads, probs never
    stored). block_b default 16: the mask block adds VMEM on top of the
    4 q/k/v/o windows, so the serving default 32 leaves no headroom at
    the B,Lq=64 visual site.

    MEASURED SLOWER than the XLA einsum training path on chip
    (drive_pretrain --attrib 8, B=256 vis_mask, rbg PRNG): forward
    68.8 vs 66.0 ms — the serving kernel's transpose win does not
    transfer because training must MATERIALIZE the (B,H,Lq,Lk) dropout
    mask in HBM as a kernel operand (~25 MB/visual site at B=256),
    traffic nn.Dropout fuses into the prob multiply; and the
    einsum-recompute backward costs 158.2 vs 103.4 ms (full step 1,061
    vs 1,336 ex/s; chained 3-task mix 1,063-1,158 vs 1,375-1,632).
    Kept as the documented experiment behind
    models/lxmert.train_attention_mode('pallas_blhd'); 'auto' resolves
    to 'xla'."""
    return _mha_blhd_train_fwd(q, k, v, bias, dropout_mask, n_heads,
                               fast, block_b)


def _blhd_train_vjp_fwd(q, k, v, bias, mask, n_heads, fast, block_b):
    out = _mha_blhd_train_fwd(q, k, v, bias, mask, n_heads, fast, block_b)
    return out, (q, k, v, bias, mask)


def _blhd_train_vjp_bwd(n_heads, fast, block_b, res, g):
    q, k, v, bias, mask = res
    _, vjp = jax.vjp(
        lambda q, k, v, b, m: _blhd_einsum_ref(q, k, v, b, m, n_heads, fast),
        q, k, v, bias, mask)
    return vjp(g)


mha_blhd_train.defvjp(_blhd_train_vjp_fwd, _blhd_train_vjp_bwd)
