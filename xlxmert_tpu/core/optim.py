"""Optimizer factory: the reference's exact "BERT-Adam" — legacy
transformers AdamW + linear warmup/decay with no-decay parameter groups
(lxmert_pretrain.py:110-141; transformers get_linear_schedule_with_warmup).

The update is reproduced exactly, not approximated by optax.adamw:
  - eps is added to the UNCORRECTED sqrt(v) (legacy AdamW), not to the
    bias-corrected one (optax.adamw) — the effective eps differs by
    sqrt(1-b2^t) (~30x at step 1).
  - step counts are PER-PARAMETER: torch AdamW skips params whose .grad
    is None and each param's state["step"] only advances when it is
    updated. Under the pretrain task round-robin, heads untouched by a
    task get no momentum decay, no weight decay, and no bias-correction
    advance on that step (lxmert_pretrain.py:334-366 — loss.backward()
    only populates the task's subgraph). `used_mask` reproduces this
    with a static per-task pytree of bools.
  - grad clipping matches torch.nn.utils.clip_grad_norm_:
    scale = max_norm / (norm + 1e-6), applied only when norm > max_norm.
  - weight decay is applied to the already-adam-updated param
    (p_new = (p - lr*adam)*(1 - lr*wd)), like the legacy class.

Gradient accumulation (`--update_freq`, tasks/vqa.py:151-159) is NOT
handled here: the reference sums raw grads across held batches, clips
the SUM, and steps optimizer+scheduler only on update steps (step 0
never updates; the epoch's last batch force-flushes) — optax.MultiSteps
averages and has none of those edges, so the finetune engine implements
it exactly in tasks/finetune.AccumTrainState instead.

Trajectory parity vs a torch transcription of the reference update is
pinned in tests/test_trainer_trajectory_parity.py.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
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
    (lxmert_pretrain.py:125: no_decay = ["bias", "LayerNorm.weight"],
    matched as torch-name substrings — so every bias plus LayerNorm
    scales; everything else, INCLUDING mask_feat, is decayed)."""
    names = [getattr(p, "key", str(p)) for p in path_elems]
    leaf = names[-1] if names else ""
    if leaf in ("bias", "scale", "out_cluster_bias"):
        return True
    return any(n == "LayerNorm" for n in names)


class BertAdamState(NamedTuple):
    count: Any        # per-leaf scalar int32 (torch per-param state["step"])
    mu: Any
    nu: Any
    sched_step: jnp.ndarray  # scalar int32: scheduler position


def reference_adamw(
    lr: float,
    total_steps: int,
    warmup_ratio: float = 0.05,
    weight_decay: float = 0.01,
    clip_grad_norm: Optional[float] = 1.0,
    eps: float = 1e-6,
    b1: float = 0.9,
    b2: float = 0.999,
    used_mask: Any = None,
) -> optax.GradientTransformation:
    """Legacy transformers AdamW + linear schedule + torch grad clipping.

    `used_mask` (optional): pytree of python bools with the params'
    structure. Leaves marked False are left completely untouched — no
    update, no momentum/step advance, no weight decay — reproducing
    torch's grad-is-None skip for heads outside the current task's loss
    subgraph. The mask is STATIC: each per-task jitted step compiles the
    unused subtrees away entirely (they also save FLOPs/HBM vs the dense
    update). State structure is identical for every mask, so per-task
    transformations share one optimizer state.
    """
    schedule = linear_warmup_decay(lr, total_steps, warmup_ratio)

    def init(params):
        return BertAdamState(
            count=jax.tree.map(lambda p: jnp.zeros([], jnp.int32), params),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
            sched_step=jnp.zeros([], jnp.int32))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("reference_adamw requires params")
        treedef = jax.tree.structure(grads)
        if used_mask is None:
            used = jax.tree.map(lambda _: True, grads)
        else:
            used = used_mask
        decay = jax.tree_util.tree_map_with_path(
            lambda path, _: not _is_no_decay(path), grads)

        lr_t = schedule(state.sched_step)
        if clip_grad_norm and clip_grad_norm > 0:
            # torch clip_grad_norm_: norm over existing grads only; the
            # zero grads our unified tree carries for unused leaves
            # contribute nothing to the norm either way
            gnorm = optax.global_norm(grads)
            clip_scale = jnp.minimum(
                1.0, clip_grad_norm / (gnorm + 1e-6))
        else:
            clip_scale = 1.0

        def leaf(g, m, v, c, p, u, d):
            if not u:
                return jnp.zeros_like(p), m, v, c
            g = (g * clip_scale).astype(m.dtype)
            m2 = b1 * m + (1 - b1) * g
            v2 = b2 * v + (1 - b2) * g * g
            c2 = c + 1
            t = c2.astype(jnp.float32)
            step_scale = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
            upd = -lr_t * step_scale * m2 / (jnp.sqrt(v2) + eps)
            if d and weight_decay:
                # legacy AdamW decays the already-adam-updated param:
                # p_new = (p + upd) * (1 - lr*wd); as a delta:
                upd = upd - lr_t * weight_decay * (p.astype(upd.dtype) + upd)
            return upd.astype(p.dtype), m2, v2, c2

        flat = [
            leaf(g, m, v, c, p, u, d)
            for g, m, v, c, p, u, d in zip(
                jax.tree.leaves(grads), jax.tree.leaves(state.mu),
                jax.tree.leaves(state.nu), jax.tree.leaves(state.count),
                jax.tree.leaves(params), jax.tree.leaves(used),
                jax.tree.leaves(decay))
        ]
        unflat = lambda i: jax.tree.unflatten(treedef, [f[i] for f in flat])
        return unflat(0), BertAdamState(
            count=unflat(3), mu=unflat(1), nu=unflat(2),
            sched_step=state.sched_step + 1)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float,
    total_steps: int,
    warmup_ratio: float = 0.05,
    weight_decay: float = 0.01,
    clip_grad_norm: Optional[float] = 1.0,
    adam_eps: float = 1e-6,
    used_mask: Any = None,
) -> optax.GradientTransformation:
    return reference_adamw(lr, total_steps, warmup_ratio, weight_decay,
                           clip_grad_norm, eps=adam_eps,
                           used_mask=used_mask)
