"""Optimizer factory: AdamW + linear warmup/decay ("BERT-Adam") with
no-decay parameter groups, mirroring the reference
(lxmert_pretrain.py:110-141; transformers get_linear_schedule_with_warmup).

Gradient accumulation (`--update_freq`, tasks/vqa.py:152-159) maps to
optax.MultiSteps.
"""
from __future__ import annotations

from typing import Optional

import optax


def linear_warmup_decay(lr: float, total_steps: int, warmup_ratio: float = 0.05):
    warmup_steps = max(int(total_steps * warmup_ratio), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )


def _is_no_decay(path_elems) -> bool:
    """bias / LayerNorm params are excluded from weight decay
    (lxmert_pretrain.py:125)."""
    names = [getattr(p, "key", str(p)) for p in path_elems]
    leaf = names[-1] if names else ""
    if leaf in ("bias", "scale", "out_cluster_bias", "mask_feat"):
        return True
    return any(n == "LayerNorm" for n in names)


def make_optimizer(
    lr: float,
    total_steps: int,
    warmup_ratio: float = 0.05,
    weight_decay: float = 0.01,
    clip_grad_norm: Optional[float] = 1.0,
    adam_eps: float = 1e-6,
    update_freq: int = 1,
) -> optax.GradientTransformation:
    schedule = linear_warmup_decay(lr, total_steps, warmup_ratio)

    def decay_mask(params):
        import jax

        return jax.tree_util.tree_map_with_path(
            lambda path, _: not _is_no_decay(path), params)

    chain = []
    if clip_grad_norm and clip_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(optax.adamw(schedule, b1=0.9, b2=0.999, eps=adam_eps,
                             weight_decay=weight_decay, mask=decay_mask))
    tx = optax.chain(*chain)
    if update_freq > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=update_freq)
    return tx
