"""Whole-block-fused int8 LXMERT serving forward.

Same math, calibration, and parameter source as the static int8 engine
(serving/lxmert_int8.py) — but the entire dense chain of every encoder
module runs inside the fused Pallas kernel (ops/fused_block.py), so the
only XLA-level work between kernels is the attention cores (einsums +
softmax), embeddings, pooler, and answer head. Every dense matmul of the
19-layer encoder (QKV, cross q|kv, out projections, FFNs) executes on
the MXU from VMEM-resident int8 activations.

Structure (mirrors lxmert_forward in serving/lxmert_int8.py — reference
call stack at /root/reference/x-lxmert/src/tasks/vqa.py:176-181):

  lang/visn stacks: [attn core] -> fused(out+LN+FFN+LN+QKV_next)
  the last lang/visn block's tail is the first x-layer's SHARED
  cross-attention q|kv projection (one concatenated (768,2304) matmul —
  both q(x) and kv(x) consume the same activation);
  x-layers: cross cores -> fused(cross-out+LN+self-QKV) -> self cores
  -> fused(self-out+LN+FFN+LN + next x-layer q|kv).

`prepare_fused` consumes the CALIBRATED tree from
lxmert_int8.apply_calibration, so both engines share one calibration.

Parity vs the static engine is pinned in tests/test_fused_block.py.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.ops.fused_block import concat_fused, fused_block, fused_weight
from xlxmert_tpu.ops.quant import int8_dense_static
from xlxmert_tpu.serving.lxmert_int8 import (
    _attention_core, _extend_mask, layer_norm,
)


def _blk(att_p: Dict, ffn_p: Dict, tail) -> Dict:
    return {
        "out": fused_weight(att_p["out"]), "ln1": att_p["ln"],
        "w1": fused_weight(ffn_p["w1"]), "w2": fused_weight(ffn_p["w2"]),
        "ln2": ffn_p["ln"], "tail": tail,
    }


def prepare_fused(sqp: Dict, cfg: LxmertConfig) -> Dict:
    """Calibrated serving tree -> fused-layout tree."""
    xl_in = sqp["x_layers"]
    # Shared cross-attention q|kv of each x-layer as ONE fused weight;
    # q and kv consume the same activation, so their calibrated scales
    # are identical (asserted in concat_fused).
    xcat = [concat_fused(p["cross"]["q"], p["cross"]["kv"]) for p in xl_in]

    fp: Dict[str, Any] = {
        "embeddings": sqp["embeddings"], "visn_fc": sqp["visn_fc"],
        "pooler": sqp["pooler"],
        "lang_qkv0": sqp["lang_layers"][0]["att"]["qkv"],
        "visn_qkv0": sqp["visn_layers"][0]["att"]["qkv"],
    }
    for name in ("lang", "visn"):
        layers = sqp[f"{name}_layers"]
        blocks = []
        for i, p in enumerate(layers):
            tail = (fused_weight(layers[i + 1]["att"]["qkv"])
                    if i + 1 < len(layers) else (xcat[0] if xcat else None))
            blocks.append(_blk(p["att"], p["ffn"], tail))
        fp[name] = blocks

    xls = []
    for i, p in enumerate(xl_in):
        xls.append({
            "cross_out": fused_weight(p["cross"]["out"]),
            "cross_ln": p["cross"]["ln"],
            "lang_self_qkv": fused_weight(p["lang_self"]["qkv"]),
            "visn_self_qkv": fused_weight(p["visn_self"]["qkv"]),
            "lang_self": _blk(p["lang_self"], p["lang_ffn"],
                              xcat[i + 1] if i + 1 < len(xl_in) else None),
            "visn_self": _blk(p["visn_self"], p["visn_ffn"],
                              xcat[i + 1] if i + 1 < len(xl_in) else None),
        })
    fp["x"] = xls
    return fp


def _run_block(ctx, x, blk, block_rows):
    """fused_block with a uniform (y, tail) return: the last block of a
    stack has tail=None when there are no x-layers (prepare_fused builds
    that), and fused_block then returns a bare array."""
    out = fused_block(
        ctx, x, blk["out"], blk["ln1"]["scale"], blk["ln1"]["bias"],
        blk["w1"], blk["w2"], blk["ln2"]["scale"], blk["ln2"]["bias"],
        tail_w=blk["tail"], has_ffn=True, block_rows=block_rows)
    return out if isinstance(out, tuple) else (out, None)


def _attn(qkv, bias, n_heads):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return _attention_core(q, k, v, bias, n_heads)


def lxmert_forward_fused(fp: Dict, input_ids, visual_feats, visual_pos,
                         attention_mask=None, visual_attention_mask=None,
                         n_heads: int = 12, block_rows: int = 256):
    """Returns (lang, visn, pooled), all bf16 — numerics of
    lxmert_int8.lxmert_forward on the static-calibrated path."""
    H = fp["pooler"]["kernel"].shape[0]
    lang_bias = _extend_mask(attention_mask)
    visn_bias = _extend_mask(visual_attention_mask)

    emb = fp["embeddings"]
    B, L = input_ids.shape
    h = (jnp.take(emb["word"], input_ids, axis=0)
         + emb["pos"][None, :L]
         + emb["type"][0][None, None, :])
    lang = layer_norm(h, emb["ln"])

    vf = fp["visn_fc"]
    x = int8_dense_static(visual_feats.astype(jnp.bfloat16), vf["feat"])
    x = layer_norm(x, vf["feat_ln"])
    y = visual_pos.astype(jnp.bfloat16) @ vf["box_kernel"] + vf["box_bias"]
    y = layer_norm(y, vf["box_ln"])
    visn = (x + y) * jnp.bfloat16(0.5)

    qkv = int8_dense_static(lang, fp["lang_qkv0"])
    for blk in fp["lang"]:
        ctx = _attn(qkv, lang_bias, n_heads)
        lang, qkv = _run_block(ctx, lang, blk, block_rows)
    lang_qkv_x = qkv  # q|kv of x-layer 0, lang side (None if no x-layers)

    qkv = int8_dense_static(visn, fp["visn_qkv0"])
    for blk in fp["visn"]:
        ctx = _attn(qkv, visn_bias, n_heads)
        visn, qkv = _run_block(ctx, visn, blk, block_rows)
    visn_qkv_x = qkv

    for xb in fp["x"]:
        ql, l_kv = lang_qkv_x[..., :H], lang_qkv_x[..., H:]
        qv, v_kv = visn_qkv_x[..., :H], visn_qkv_x[..., H:]
        kl, vl = jnp.split(l_kv, 2, axis=-1)
        kv_, vv = jnp.split(v_kv, 2, axis=-1)
        # shared cross-attention, both directions
        ctx_l = _attention_core(ql, kv_, vv, visn_bias, n_heads)
        ctx_v = _attention_core(qv, kl, vl, lang_bias, n_heads)
        new_lang, sq_l = fused_block(
            ctx_l, lang, xb["cross_out"], xb["cross_ln"]["scale"],
            xb["cross_ln"]["bias"], tail_w=xb["lang_self_qkv"],
            has_ffn=False, block_rows=block_rows)
        new_visn, sq_v = fused_block(
            ctx_v, visn, xb["cross_out"], xb["cross_ln"]["scale"],
            xb["cross_ln"]["bias"], tail_w=xb["visn_self_qkv"],
            has_ffn=False, block_rows=block_rows)
        ctx = _attn(sq_l, lang_bias, n_heads)
        out_l = _run_block(ctx, new_lang, xb["lang_self"],
                           block_rows)
        ctx = _attn(sq_v, visn_bias, n_heads)
        out_v = _run_block(ctx, new_visn, xb["visn_self"],
                           block_rows)
        # uniform (y, tail) from _run_block; tail is None on the last
        # x-layer (no next QKV to fuse) and simply goes unused
        lang, lang_qkv_x = out_l
        visn, visn_qkv_x = out_v

    pooled = jnp.tanh(lang[:, 0] @ fp["pooler"]["kernel"]
                      + fp["pooler"]["bias"])
    return lang, visn, pooled
