"""X-LXMERT pretraining model + loss functions (TPU-native).

Mirrors the behavior of `XLxmertForPretraining`
(/root/reference/x-lxmert/src/lxrt/modeling.py:56-308): visual input comes
from a frozen centroid table indexed by cluster ids, masked cells are
replaced by a learned `mask_feat` vector, and per-task losses (MLM CE,
matched CE, visual-cluster CE, feat SmoothL1, QA CE) are computed from the
backbone outputs.

Functional differences from the torch design (all by construction, not
behavior changes):
  - Weight tying is by value: the word-embedding matrix and the centroid
    table are passed into `__call__`; there is no parameter aliasing.
  - The centroid table is an input, not a parameter — it is frozen in the
    reference (nn.Embedding.from_pretrained(freeze=True), modeling.py:146)
    so keeping it out of the optimizer state is free here.
  - `task` is a static argument: each task round-robin entry
    (lxmert_pretrain.py:295-298) gets its own fused XLA program, which
    replaces DDP's find_unused_parameters workaround entirely.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.models.lxmert import (
    LxmertModel, PreTrainingHeads, VisualAnswerHead, VisualObjHead,
)

Dtype = Any


class XLxmert(nn.Module):
    """Backbone + pretraining heads + learned mask_feat."""

    config: LxmertConfig
    dtype: Dtype = jnp.float32
    task_qa: bool = False

    def setup(self):
        cfg = self.config
        self.bert = LxmertModel(cfg, self.dtype)
        self.cls = PreTrainingHeads(cfg, self.dtype)
        self.obj_predict_head = VisualObjHead(cfg, self.dtype)
        if self.task_qa:
            self.answer_head = VisualAnswerHead(cfg, cfg.num_qa_labels, self.dtype)
        # learned mask embedding substituted at masked cells
        # (reference modeling.py:92,190-193)
        self.mask_feat = self.param(
            "mask_feat", nn.initializers.zeros, (cfg.visual_feat_dim,), jnp.float32)

    def encode(self, input_ids, visual_feats, visual_pos, attention_mask=None,
               vis_mask=None, token_type_ids=None, deterministic=True):
        """Common path: optional mask-feat substitution + backbone."""
        if vis_mask is not None:
            visual_feats = jnp.where(
                vis_mask[..., None] > 0,
                self.mask_feat.astype(visual_feats.dtype)[None, None, :],
                visual_feats)
        return self.bert(input_ids, visual_feats, visual_pos,
                         attention_mask=attention_mask,
                         token_type_ids=token_type_ids,
                         deterministic=deterministic)

    def __call__(self, input_ids, visual_feats, visual_pos,
                 attention_mask=None, vis_mask=None, token_type_ids=None,
                 centroids=None, word_embedding_matrix=None,
                 heads: Tuple[str, ...] = ("lm", "matched"),
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Run the backbone plus the requested heads.

        `heads` is static: {"lm", "matched", "obj", "feat", "qa"}.
        Returns a dict of logits/outputs.
        """
        lang, visn, pooled = self.encode(
            input_ids, visual_feats, visual_pos, attention_mask, vis_mask,
            token_type_ids, deterministic)
        out: Dict[str, jnp.ndarray] = {
            "lang_output": lang, "visual_output": visn, "pooled_output": pooled}

        if "lm" in heads or "matched" in heads:
            lm_logits, matched_logits = self.cls(lang, pooled, word_embedding_matrix)
            if "lm" in heads:
                out["lm_logits"] = lm_logits
            if "matched" in heads:
                out["matched_logits"] = matched_logits
        obj_keys = tuple(k for k in ("obj", "feat", "attr") if k in heads)
        if obj_keys:
            head_out = self.obj_predict_head(visn, centroids, out_keys=obj_keys)
            if "obj" in obj_keys:
                out["obj_logits"] = head_out["obj"]
            if "feat" in obj_keys:
                out["feat_pred"] = head_out["feat"]
            if "attr" in obj_keys:
                out["attr_logits"] = head_out["attr"]
        if "qa" in heads and self.task_qa:
            out["qa_logits"] = self.answer_head(pooled)
        return out


def embed_clusters(cluster_ids: jnp.ndarray, centroids: jnp.ndarray,
                   dtype=jnp.float32) -> jnp.ndarray:
    """cluster ids (B, V) -> visual feats (B, V, D) from the frozen centroid
    table (reference modeling.py:185-186). A pure gather — stays in HBM."""
    return jnp.take(centroids, cluster_ids, axis=0).astype(dtype)


# ---------------------------------------------------------------------------
# Losses (reference modeling.py:216-304). All computed in fp32.
# ---------------------------------------------------------------------------


def cross_entropy_ignore(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over positions with label >= 0 (covers the reference's
    ignore_index=-100 *and* its -1 MLM labels — see ops/masking.py)."""
    logits = logits.astype(jnp.float32)
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, nll, 0.0).sum() / n


def smooth_l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Elementwise SmoothL1 (huber, beta=1), matching torch SmoothL1Loss."""
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def masked_feat_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     vis_mask: jnp.ndarray) -> jnp.ndarray:
    """SmoothL1, mean over feat dim, masked mean over cells, mean over batch
    (reference modeling.py:273-287)."""
    per_cell = smooth_l1(pred.astype(jnp.float32),
                         target.astype(jnp.float32)).mean(axis=2)
    masked = (per_cell * vis_mask).sum(axis=1)
    n_mask = jnp.clip(vis_mask.sum(axis=1), 1, None)
    return (masked / n_mask).mean()


def pretrain_losses(out: Dict[str, jnp.ndarray], labels: Dict[str, jnp.ndarray],
                    task: str,
                    visual_loss_keys: Tuple[str, ...] = ("obj",),
                    task_qa: bool = False) -> Dict[str, jnp.ndarray]:
    """Per-task total loss, mirroring reference modeling.py:216-304.

    labels keys (per task): word_labels | matched_labels |
    obj_labels / feat_labels + vis_mask | qa_labels.
    """
    losses: Dict[str, jnp.ndarray] = {}
    total = jnp.float32(0.0)

    if task == "word_mask":
        lm = cross_entropy_ignore(out["lm_logits"], labels["word_labels"])
        losses["lm_loss"] = lm
        total += lm
    elif task == "matched":
        m = cross_entropy_ignore(out["matched_logits"], labels["matched_labels"])
        losses["matched_loss"] = m
        total += m
    elif task == "vis_mask":
        vis_total = jnp.float32(0.0)
        if "obj" in visual_loss_keys and "obj_logits" in out:
            obj = cross_entropy_ignore(out["obj_logits"], labels["obj_labels"])
            losses["obj_loss"] = obj
            vis_total += obj
        if "attr" in visual_loss_keys and "attr_labels" in labels:
            attr = cross_entropy_ignore(out["attr_logits"],
                                        labels["attr_labels"])
            losses["attr_loss"] = attr
            vis_total += attr
        if "feat" in visual_loss_keys and "feat_labels" in labels:
            fl = masked_feat_loss(out["feat_pred"], labels["feat_labels"],
                                  labels["vis_mask"])
            losses["feat_loss"] = fl
            vis_total += fl
        losses["vis_loss"] = vis_total
        total += vis_total

    if task_qa and "qa_logits" in out:
        qa = cross_entropy_ignore(out["qa_logits"], labels["qa_labels"])
        losses["qa_loss"] = qa
        losses["qa_pred"] = jnp.argmax(out["qa_logits"], axis=-1)
        total += qa

    losses["total_loss"] = total
    return losses


def get_word_embedding_matrix(params) -> jnp.ndarray:
    """Pull the tied word-embedding table out of an XLxmert param pytree."""
    return params["bert"]["embeddings"]["word_embeddings"]["embedding"]
