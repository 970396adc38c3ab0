"""TPU-native LXMERT backbone (flax.linen).

Re-implements the architecture the reference delegates to HuggingFace
`transformers.models.lxmert.modeling_lxmert` (see SURVEY.md §2.2; the
reference imports it at x-lxmert/src/lxrt/modeling.py:5). Numerically
verified against the torch implementation in tests/test_lxmert_parity.py.

Architecture (HF modeling_lxmert.py, verified against the installed source):
  - Embeddings: word + absolute-position + token-type, LayerNorm(1e-12).
  - VisualFeatureEncoder: visn_fc(2048->768)+LN and box_fc(4->768)+LN,
    output = (x + y) / 2.
  - Encoder: l_layers language self-attn blocks -> r_layers visual
    ("relational") self-attn blocks -> x_layers cross-modality blocks.
    Each X block applies ONE shared cross-attention module in both
    directions (lang<-vis and vis<-lang with the same weights), then
    per-modality self-attn, then per-modality FFN.
  - Pooler: tanh-dense over the first language token ([CLS]).

TPU-first design notes:
  - All shapes are static: text padded to `max_text_length`, visual tokens
    fixed at grid_size**2. Masking is additive-bias, never boolean gather.
  - Attention is einsum-form so XLA tiles the (B, 12, L, L) contractions
    onto the MXU; softmax is computed in fp32 regardless of compute dtype.
  - `dtype` controls activation/compute precision (bf16 for training and
    serving; fp32 for parity tests). Parameters are always stored fp32.
  - Module/parameter names deliberately mirror the torch attribute paths so
    checkpoint conversion (core/convert.py) is a mechanical rename.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xlxmert_tpu.core.config import LxmertConfig

Dtype = Any

NEG_INF = -1e9  # large-negative additive mask (fp32-safe, bf16-safe)

# Serving-mode switches (training and parity tests keep the exact path):
#   FAST_SOFTMAX: softmax in compute dtype instead of fp32
#   FAST_GELU: tanh-approximate gelu instead of exact erf
#   ATTENTION_IMPL: "pallas" routes attention through the fused VMEM
#     kernel (ops/attention.py); "xla" keeps the einsum formulation.
# Flipped together by `serving_mode()`; deviation is within bf16 rounding.
#
# Measured dead end (don't redo): fusing QKV into one matmul by
# concatenating the three kernels at call time LOWERS throughput
# (7966 vs 8547 q/s at B=256) — the per-call weight concat costs more
# than the saved launches; XLA already handles same-LHS matmuls well.
FAST_SOFTMAX = False
FAST_GELU = False
ATTENTION_IMPL = "xla"
# FUSED_FFN routes each Intermediate+FFOutput pair through the Pallas
# fused-FFN kernel (ops/ffn.py): the (rows, 3072) intermediate stays in
# VMEM instead of round-tripping HBM between the two matmuls. MEASURED
# SLOWER at B=256 (7518 vs 8547 q/s): the weight chunks are re-streamed
# per row tile, which costs more than the intermediate saves at these
# sizes — opt-in only.
FUSED_FFN = False
# TRAIN_ATTENTION_IMPL routes the NON-deterministic (training) forward
# through ops/attention.mha_blhd_train: Pallas BL(HD) forward with the
# dropout mask passed as a kernel operand (drawn from the module's
# "dropout" RNG like nn.Dropout), einsum-recompute backward with the
# same mask (exact grads). Independent of serving_mode(); default "xla"
# keeps the exact einsum formulation for parity tests.
TRAIN_ATTENTION_IMPL = "xla"


def train_attention_mode(impl: str = "auto") -> str:
    """Select the training-path attention implementation.

    "auto" resolves to "xla" on every platform: the kernel route was
    MEASURED SLOWER on chip (drive_pretrain --attrib 8, B=256 vis_mask:
    fwd 68.8 vs 66.0 ms — materializing the (B,H,Lq,Lk) dropout mask
    for the kernel costs more HBM than the head transposes it removes,
    the traffic nn.Dropout fuses into the prob multiply — and the
    einsum-recompute backward is 158.2 vs 103.4 ms; full step 1,061 vs
    1,336 ex/s). "pallas_blhd" stays available as the documented
    experiment. Returns the resolved impl. Flip BEFORE building/jitting
    the train step — the flag is read at trace time."""
    global TRAIN_ATTENTION_IMPL
    if impl == "auto":
        impl = "xla"
    TRAIN_ATTENTION_IMPL = impl
    return impl


def serving_mode(on: bool = True, attention: str = "auto",
                 fused_ffn: bool = False) -> None:
    # attention="auto" resolves to the round-5 BL(HD) layout-native
    # kernel on accelerators (measured +29% on the bf16 serving path:
    # 10,377 vs 8,032 q/s at B=256/L=20, scripts/drive_attention_layout
    # --bf16) and to "xla" on CPU (keeps the test suite fast; interpret
    # mode is opt-in via attention="pallas_blhd"). The per-(B,H,L,D)
    # "pallas" fused_mha kernel remains the measured loser at these
    # shapes (see ops/attention.py docstring) — opt-in only.
    global FAST_SOFTMAX, FAST_GELU, ATTENTION_IMPL, FUSED_FFN
    if attention == "auto":
        attention = ("xla" if jax.devices()[0].platform == "cpu"
                     else "pallas_blhd")
    FAST_SOFTMAX = on
    FAST_GELU = on
    ATTENTION_IMPL = attention if on else "xla"
    FUSED_FFN = fused_ffn and on


def _gelu(x):
    return nn.gelu(x, approximate=FAST_GELU)


def extend_attention_mask(mask: Optional[jnp.ndarray], dtype: Dtype) -> Optional[jnp.ndarray]:
    """(B, L) {0,1} mask -> (B, 1, 1, L) additive bias (0 keep / -inf drop)."""
    if mask is None:
        return None
    bias = (1.0 - mask.astype(jnp.float32)) * NEG_INF
    return bias[:, None, None, :].astype(dtype)


class Attention(nn.Module):
    """Multi-head attention core (HF LxmertAttention)."""

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, context, attention_bias=None,
                 deterministic: bool = True):
        cfg = self.config
        H, D = cfg.num_attention_heads, cfg.head_dim
        dense = lambda name: nn.Dense(
            cfg.hidden_size, dtype=self.dtype,
            kernel_init=nn.initializers.normal(cfg.initializer_range), name=name)
        q = dense("query")(hidden_states)
        k = dense("key")(context)
        v = dense("value")(context)

        B, Lq, _ = q.shape
        Lk = k.shape[1]

        if ATTENTION_IMPL == "pallas_blhd" and deterministic:
            # round-5 layout-native kernel: consumes the packed (B,L,H*D)
            # dense outputs directly, so XLA inserts no (B,L,H,D) <->
            # (B,H,L,D) transpose copies (~30us/sample at B=256 in the
            # int8 engine trace; the copies exist on this path too)
            from xlxmert_tpu.ops.attention import mha_blhd

            return mha_blhd(q, k, v, attention_bias, H, FAST_SOFTMAX)

        if TRAIN_ATTENTION_IMPL == "pallas_blhd" and not deterministic:
            # training variant: the attention-prob dropout mask is drawn
            # here (same flax "dropout" RNG collection nn.Dropout uses)
            # and applied INSIDE the kernel; backward recomputes via the
            # einsum formulation with the same mask (ops/attention.py)
            from xlxmert_tpu.ops.attention import mha_blhd_train

            rate = cfg.attention_probs_dropout_prob
            mask = None
            if rate > 0.0:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - rate, (B, H, Lq, Lk))
                mask = keep.astype(self.dtype) / jnp.asarray(
                    1.0 - rate, self.dtype)
            return mha_blhd_train(q, k, v, attention_bias, mask, H,
                                  FAST_SOFTMAX)

        q = q.reshape(B, Lq, H, D)
        k = k.reshape(B, Lk, H, D)
        v = v.reshape(B, Lk, H, D)

        if ATTENTION_IMPL == "pallas" and deterministic:
            from xlxmert_tpu.ops.attention import fused_mha

            # bias arrives as (B, 1, 1, Lk) additive; kernel wants (B, Lk)
            bias2d = (attention_bias.reshape(B, Lk)
                      if attention_bias is not None else None)
            ctx = fused_mha(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                            v.transpose(0, 2, 1, 3), bias2d,
                            FAST_SOFTMAX)
            return ctx.transpose(0, 2, 1, 3).reshape(B, Lq, H * D)

        acc_t = self.dtype if FAST_SOFTMAX else jnp.float32
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=acc_t)
        scores = scores * jnp.asarray(1.0 / np.sqrt(D), acc_t)
        if attention_bias is not None:
            scores = scores + attention_bias.astype(acc_t)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attention_probs_dropout_prob)(
            probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return ctx.reshape(B, Lq, H * D)


class AttentionOutput(nn.Module):
    """Projection + residual + LayerNorm (HF LxmertAttentionOutput)."""

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, input_tensor, deterministic: bool = True):
        cfg = self.config
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(cfg.initializer_range),
                     name="dense")(hidden_states)
        h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="LayerNorm")(h + input_tensor)
        return h


class SelfAttentionLayer(nn.Module):
    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_bias=None, deterministic: bool = True):
        h = Attention(self.config, self.dtype, name="self")(
            x, x, attention_bias, deterministic)
        return AttentionOutput(self.config, self.dtype, name="output")(
            h, x, deterministic)


class CrossAttentionLayer(nn.Module):
    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, ctx_attention_bias=None, deterministic: bool = True):
        h = Attention(self.config, self.dtype, name="att")(
            x, ctx, ctx_attention_bias, deterministic)
        return AttentionOutput(self.config, self.dtype, name="output")(
            h, x, deterministic)


class Intermediate(nn.Module):
    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.config.intermediate_size, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(self.config.initializer_range),
                     name="dense")(x)
        # HF uses exact (erf) gelu for lxmert's default hidden_act="gelu";
        # serving mode swaps in the tanh approximation.
        return _gelu(h)


class FFOutput(nn.Module):
    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, input_tensor, deterministic: bool = True):
        cfg = self.config
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(cfg.initializer_range),
                     name="dense")(x)
        h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(h + input_tensor)


class _DenseParams(nn.Module):
    """Param-only mirror of nn.Dense (same kernel/bias paths)."""

    in_features: int
    features: int
    std: float

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.normal(self.std),
                       (self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class _IntermediateParams(nn.Module):
    """Param-only mirror of Intermediate: <name>/dense/{kernel,bias}."""

    config: LxmertConfig

    @nn.compact
    def __call__(self):
        cfg = self.config
        return _DenseParams(cfg.hidden_size, cfg.intermediate_size,
                            cfg.initializer_range, name="dense")()


class _FFOutputParams(nn.Module):
    """Param-only mirror of FFOutput: dense/{kernel,bias} +
    LayerNorm/{scale,bias}."""

    config: LxmertConfig

    @nn.compact
    def __call__(self):
        cfg = self.config
        w, b = _DenseParams(cfg.intermediate_size, cfg.hidden_size,
                            cfg.initializer_range, name="dense")()
        scale = self.param_child_ln()
        return w, b, scale

    def param_child_ln(self):
        class _LN(nn.Module):
            hid: int

            @nn.compact
            def __call__(inner):
                g = inner.param("scale", nn.initializers.ones,
                                (inner.hid,), jnp.float32)
                be = inner.param("bias", nn.initializers.zeros,
                                 (inner.hid,), jnp.float32)
                return g, be

        return _LN(self.config.hidden_size, name="LayerNorm")()


def _ffn_block(cfg: LxmertConfig, dtype, att, deterministic: bool,
               inter_name: str, out_name: str):
    """Intermediate -> FFOutput, via the fused Pallas kernel on the
    serving path (FUSED_FFN). Both branches declare identical param trees,
    so a model initialized on either path applies on both."""
    if FUSED_FFN and deterministic:
        from xlxmert_tpu.ops.ffn import fused_ffn

        w1, b1 = _IntermediateParams(cfg, name=inter_name)()
        w2, b2, (g, be) = _FFOutputParams(cfg, name=out_name)()
        return fused_ffn(att.astype(dtype), w1, b1, w2, b2, g, be,
                         approx_gelu=FAST_GELU, eps=cfg.layer_norm_eps)
    inter = Intermediate(cfg, dtype, name=inter_name)(att)
    return FFOutput(cfg, dtype, name=out_name)(inter, att, deterministic)


class TransformerLayer(nn.Module):
    """Self-attn + FFN block (HF LxmertLayer): language and relational stacks."""

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_bias=None, deterministic: bool = True):
        att = SelfAttentionLayer(self.config, self.dtype, name="attention")(
            x, attention_bias, deterministic)
        return _ffn_block(self.config, self.dtype, att, deterministic,
                          "intermediate", "output")


class XLayer(nn.Module):
    """Cross-modality block (HF LxmertXLayer).

    The single `visual_attention` module is applied twice with shared
    weights — lang attends to vision and vision attends to lang — which is
    load-bearing for checkpoint parity (SURVEY.md §2.2).
    """

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lang, lang_bias, visn, visn_bias, deterministic: bool = True):
        cross = CrossAttentionLayer(self.config, self.dtype, name="visual_attention")
        lang_att = cross(lang, visn, visn_bias, deterministic)
        visn_att = cross(visn, lang, lang_bias, deterministic)

        lang_att = SelfAttentionLayer(self.config, self.dtype, name="lang_self_att")(
            lang_att, lang_bias, deterministic)
        visn_att = SelfAttentionLayer(self.config, self.dtype, name="visn_self_att")(
            visn_att, visn_bias, deterministic)

        lang_out = _ffn_block(self.config, self.dtype, lang_att,
                              deterministic, "lang_inter", "lang_output")
        visn_out = _ffn_block(self.config, self.dtype, visn_att,
                              deterministic, "visn_inter", "visn_output")
        return lang_out, visn_out


class VisualFeatureEncoder(nn.Module):
    """(feats, boxes) -> hidden (HF LxmertVisualFeatureEncoder): (x + y) / 2."""

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, visual_feats, visual_pos, deterministic: bool = True):
        cfg = self.config
        init = nn.initializers.normal(cfg.initializer_range)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init,
                     name="visn_fc")(visual_feats.astype(self.dtype))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="visn_layer_norm")(x)
        y = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init,
                     name="box_fc")(visual_pos.astype(self.dtype))
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="box_layer_norm")(y)
        out = (x + y) * 0.5
        return nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)


class Embeddings(nn.Module):
    """Word + position + token-type embeddings (HF LxmertEmbeddings)."""

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic: bool = True):
        cfg = self.config
        init = nn.initializers.normal(cfg.initializer_range)
        B, L = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        words = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                         embedding_init=init, name="word_embeddings")(input_ids)
        position_ids = jnp.arange(L, dtype=jnp.int32)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, embedding_init=init,
                       name="position_embeddings")(position_ids)
        tok = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                       embedding_init=init,
                       name="token_type_embeddings")(token_type_ids)
        h = words + pos + tok
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="LayerNorm")(h)
        return nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)


class Encoder(nn.Module):
    """9 language -> 5 relational -> 5 cross-modality blocks (HF LxmertEncoder)."""

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lang_feats, lang_bias, visual_feats, visual_pos,
                 visual_bias=None, deterministic: bool = True):
        cfg = self.config
        visn = VisualFeatureEncoder(cfg, self.dtype, name="visn_fc")(
            visual_feats, visual_pos, deterministic)
        lang = lang_feats
        # Torch name for the language stack is `layer` (BERT-weight loading quirk).
        for i in range(cfg.l_layers):
            lang = TransformerLayer(cfg, self.dtype, name=f"layer_{i}")(
                lang, lang_bias, deterministic)
        for i in range(cfg.r_layers):
            visn = TransformerLayer(cfg, self.dtype, name=f"r_layers_{i}")(
                visn, visual_bias, deterministic)
        for i in range(cfg.x_layers):
            lang, visn = XLayer(cfg, self.dtype, name=f"x_layers_{i}")(
                lang, lang_bias, visn, visual_bias, deterministic)
        return lang, visn


class Pooler(nn.Module):
    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lang_hidden):
        h = nn.Dense(self.config.hidden_size, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(self.config.initializer_range),
                     name="dense")(lang_hidden[:, 0])
        return jnp.tanh(h)


class LxmertModel(nn.Module):
    """Full backbone: embeddings -> encoder -> pooler (HF LxmertModel).

    Returns (lang_output, visual_output, pooled_output).
    """

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, visual_feats, visual_pos,
                 attention_mask=None, visual_attention_mask=None,
                 token_type_ids=None, deterministic: bool = True):
        cfg = self.config
        lang_bias = extend_attention_mask(attention_mask, self.dtype)
        visual_bias = extend_attention_mask(visual_attention_mask, self.dtype)
        emb = Embeddings(cfg, self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic)
        lang, visn = Encoder(cfg, self.dtype, name="encoder")(
            emb, lang_bias, visual_feats, visual_pos, visual_bias, deterministic)
        pooled = Pooler(cfg, self.dtype, name="pooler")(lang)
        return lang, visn, pooled


# ---------------------------------------------------------------------------
# Heads (HF modeling_lxmert.py heads + the reference's cluster-output override
# at x-lxmert/src/lxrt/modeling.py:8-53).
# ---------------------------------------------------------------------------


class PredictionHeadTransform(nn.Module):
    """dense -> gelu -> LayerNorm (HF LxmertPredictionHeadTransform)."""

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(cfg.initializer_range),
                     name="dense")(x)
        h = _gelu(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(h)


class LMPredictionHead(nn.Module):
    """Transform + decoder tied to the word embeddings + bias
    (HF LxmertLMPredictionHead). The tied embedding matrix is passed in
    at call time — weight tying by value, the functional-JAX way.
    """

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, word_embedding_matrix):
        h = PredictionHeadTransform(self.config, self.dtype, name="transform")(hidden)
        logits = jnp.einsum("bld,vd->blv", h,
                            word_embedding_matrix.astype(self.dtype),
                            preferred_element_type=jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.config.vocab_size,), jnp.float32)
        return logits + bias


class PreTrainingHeads(nn.Module):
    """LM head + 2-way matched head (HF LxmertPreTrainingHeads)."""

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sequence_output, pooled_output, word_embedding_matrix):
        lm = LMPredictionHead(self.config, self.dtype, name="predictions")(
            sequence_output, word_embedding_matrix)
        matched = nn.Dense(2, dtype=self.dtype,
                           kernel_init=nn.initializers.normal(
                               self.config.initializer_range),
                           name="seq_relationship")(pooled_output)
        return lm, matched.astype(jnp.float32)


class VisualObjHead(nn.Module):
    """The reference's visual prediction head
    (x-lxmert/src/lxrt/modeling.py:8-53): transform -> linear_feat
    (768->2048), then
      - clustering mode (num_clusters > 0): out_cluster whose weight is
        TIED to the frozen k-means centroid table (modeling.py:140-151) —
        the centroid matrix is passed at call time; only a bias is kept;
      - detector-vocab mode (num_clusters == 0): out_obj
        (-> num_object_labels) and out_attr (-> num_attr_labels) Denses
        (modeling.py:33-36), used with the bbox-feature path.
    """

    config: LxmertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, centroids=None, out_keys=("obj",)):
        cfg = self.config
        h = PredictionHeadTransform(cfg, self.dtype, name="transform")(hidden)
        feat = nn.Dense(cfg.visual_feat_dim, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(cfg.initializer_range),
                        name="linear_feat")(h)
        out = {}
        if "feat" in out_keys:
            out["feat"] = feat
        if "obj" in out_keys:
            if cfg.clustering:
                # logits against the (num_clusters, 2048) centroid table —
                # an MXU-friendly (B*64, 2048) x (2048, 10000) matmul.
                bias = self.param("out_cluster_bias", nn.initializers.zeros,
                                  (cfg.num_clusters,), jnp.float32)
                logits = jnp.einsum("blf,cf->blc", feat,
                                    centroids.astype(self.dtype),
                                    preferred_element_type=jnp.float32)
                out["obj"] = logits + bias
            else:
                out["obj"] = nn.Dense(
                    cfg.num_object_labels, dtype=self.dtype,
                    kernel_init=nn.initializers.normal(cfg.initializer_range),
                    name="out_obj")(feat).astype(jnp.float32)
        if "attr" in out_keys:
            out["attr"] = nn.Dense(
                cfg.num_attr_labels, dtype=self.dtype,
                kernel_init=nn.initializers.normal(cfg.initializer_range),
                name="out_attr")(feat).astype(jnp.float32)
        return out


class VisualAnswerHead(nn.Module):
    """hid -> 2*hid -> GeLU -> LN -> num_labels (HF LxmertVisualAnswerHead)."""

    config: LxmertConfig
    num_labels: int = 9500
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        cfg = self.config
        init = nn.initializers.normal(cfg.initializer_range)
        h = nn.Dense(cfg.hidden_size * 2, dtype=self.dtype, kernel_init=init,
                     name="logit_fc_0")(pooled)
        h = _gelu(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="logit_fc_2")(h)
        h = nn.Dense(self.num_labels, dtype=self.dtype, kernel_init=init,
                     name="logit_fc_3")(h)
        return h.astype(jnp.float32)
