"""Task models for finetuning: VQA / GQA / NLVR2.

References:
  - VQAModel / GQAModel: tasks/{vqa,gqa}_model.py:7-72 — backbone pooled
    [CLS] -> LxmertVisualAnswerHead(num_answers).
  - NLVR2Model: tasks/nlvr2_model.py:7-93 — 2 images/example: flatten
    (B,2,V,D)->(2B,V,D), repeat the sentence per image (nlvr2.py:159),
    concat the two pooled outputs -> (B, 2*hidden) -> 2-way head. (The
    reference file has `self.answer_head`/`logit_fc` naming bugs and a
    dimension mismatch; we implement the intent = original LXMERT NLVR2
    head with 2*hidden input, which our VisualAnswerHead matches since its
    first dense outputs 2*hidden regardless of input width.)
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.models.lxmert import LxmertModel, VisualAnswerHead

Dtype = Any


class VQAModel(nn.Module):
    """Also serves GQA (identical shape, tasks/gqa_model.py:7-72)."""

    config: LxmertConfig
    num_answers: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.bert = LxmertModel(self.config, self.dtype)
        self.answer_head = VisualAnswerHead(self.config, self.num_answers,
                                            self.dtype)

    def __call__(self, input_ids, visual_feats, visual_pos,
                 attention_mask=None, token_type_ids=None,
                 deterministic: bool = True):
        _, _, pooled = self.bert(
            input_ids, visual_feats.astype(self.dtype), visual_pos,
            attention_mask=attention_mask, token_type_ids=token_type_ids,
            deterministic=deterministic)
        return self.answer_head(pooled)


class NLVR2Model(nn.Module):
    config: LxmertConfig
    num_answers: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.bert = LxmertModel(self.config, self.dtype)
        # named answer_head for checkpoint-surgery compatibility; width
        # follows the input (2*hidden) like the original LXMERT NLVR2 head.
        self.logit_fc = VisualAnswerHead(self.config, self.num_answers,
                                         self.dtype)

    def __call__(self, input_ids, visual_feats, visual_pos,
                 attention_mask=None, deterministic: bool = True):
        """input_ids: (B, L); visual_feats: (B, 2, V, D); visual_pos (B,2,V,4)."""
        B, n_images, V, D = visual_feats.shape
        assert n_images == 2
        feats = visual_feats.reshape(B * 2, V, D).astype(self.dtype)
        pos = visual_pos.reshape(B * 2, V, -1)
        # sentence repeated per image (nlvr2.py:159)
        ids = jnp.repeat(input_ids, 2, axis=0)
        mask = (jnp.repeat(attention_mask, 2, axis=0)
                if attention_mask is not None else None)
        _, _, pooled = self.bert(ids, feats, pos, attention_mask=mask,
                                 deterministic=deterministic)
        pooled = pooled.reshape(B, -1)  # (B, 2*hidden)
        return self.logit_fc(pooled)
