"""Text-to-image code samplers: NAR mask-predict and AR decoding loops.

Reference: x-lxmert/src/tasks/imggen_model.py —
  - sample_image_NAR (:169-257): linear mask-count decay
    n_mask = int((n_steps - i)/n_steps * 64); each step re-masks the
    n_mask lowest-probability cells, re-predicts the full grid, and
    commits predictions at masked positions.
  - sample_image_AR (:49-167): one grid cell committed per step; position
    strategies: max-confidence with a visited mask (:92-93,140-149),
    top-left-to-bottom-right (:106-107), or a given order (:78-90).

TPU-native design: the whole decode loop is ONE jitted program — a
`lax.fori_loop` whose body is the LXMERT forward + the 10k-way cluster
head (an MXU matmul against the HBM-resident centroid table) + the
commit/re-mask logic. Fixed 64-cell grid, fixed step count, static shapes
throughout. The per-step "n lowest cells" selection is rank-thresholding
(double argsort), which is top-k without data-dependent shapes.

The sampler returns the final code grid (B, 64, 2048) and cluster ids;
rendering to pixels is the SPADE generator's job (models/gan.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from xlxmert_tpu.models.xlxmert import XLxmert
from xlxmert_tpu.utils.boxes import box_position

NEG = -10000.0  # matches reference masked_fill value (imggen_model.py:141-142)


def nar_mask_counts(n_steps: int, n_cells: int):
    """Python-side schedule preview (testing aid): the mask count per step."""
    return [int((n_steps - i) / n_steps * n_cells) for i in range(n_steps)]


def _predict(model: XLxmert, params, input_ids, attention_mask, code,
             visual_pos, vis_mask, centroids):
    """One grid prediction: masked forward -> per-cell (best prob, id)."""
    out = model.apply(
        {"params": params}, input_ids, code, visual_pos,
        attention_mask=attention_mask, vis_mask=vis_mask,
        centroids=centroids, heads=("obj",), deterministic=True)
    probs = jax.nn.softmax(out["obj_logits"].astype(jnp.float32), axis=-1)
    pred_prob = probs.max(axis=-1)
    pred_id = probs.argmax(axis=-1)
    return pred_prob, pred_id


def make_nar_sampler(model: XLxmert, n_steps: int, grid_size: int = 8,
                     collect_intermediate: bool = False):
    """Build the jitted NAR mask-predict sampler.

    Returns fn(params, centroids, input_ids, attention_mask)
      -> (code (B,V,D), cluster_ids (B,V), pred_prob (B,V)).
    With collect_intermediate, code/ids gain a leading (n_steps,) axis —
    the per-step grids the reference renders when return_intermediate is
    set (imggen_model.py:245-248).
    """
    n_cells = grid_size * grid_size
    box_pos = jnp.asarray(box_position(grid_size))

    @jax.jit
    def sample(params, centroids, input_ids, attention_mask):
        B = input_ids.shape[0]
        D = centroids.shape[1]
        pos = jnp.broadcast_to(box_pos[None], (B, n_cells, 4))
        code0 = jnp.zeros((B, n_cells, D), centroids.dtype)
        ids0 = jnp.zeros((B, n_cells), jnp.int32)
        # uniform initial "probabilities": step 0 masks all cells anyway
        prob0 = jnp.zeros((B, n_cells), jnp.float32)

        def step(carry, i):
            code, ids, prob = carry
            # linear decay: int((n_steps - i)/n_steps * n_cells)
            n_mask = ((n_steps - i) * n_cells) // n_steps
            ranks = jnp.argsort(jnp.argsort(prob, axis=-1), axis=-1)
            vis_mask = (ranks < n_mask).astype(jnp.float32)

            pred_prob, pred_id = _predict(
                model, params, input_ids, attention_mask, code, pos,
                vis_mask, centroids)
            pred_code = jnp.take(centroids, pred_id, axis=0)

            m = vis_mask[..., None] > 0
            code = jnp.where(m, pred_code, code)
            ids = jnp.where(vis_mask > 0, pred_id, ids)
            out = (code, ids) if collect_intermediate else None
            return (code, ids, pred_prob), out

        (code, ids, prob), collected = jax.lax.scan(
            step, (code0, ids0, prob0), jnp.arange(n_steps))
        if collect_intermediate:
            return collected[0], collected[1], prob
        return code, ids, prob

    return sample


def make_ar_sampler(model: XLxmert, grid_size: int = 8,
                    strategy: str = "confidence",
                    n_steps: Optional[int] = None):
    """Build the jitted AR sampler. strategy in {"confidence", "TLBR",
    "order"}; "order" consumes a caller-provided (n_steps,) position array
    (the reference's pre-shuffled `positions` list, imggen_model.py:78-90).

    Returns fn(params, centroids, input_ids, attention_mask[, positions])
      -> (code, cluster_ids).
    """
    if strategy not in ("confidence", "TLBR", "order"):
        raise ValueError(
            f"strategy {strategy!r} not in ('confidence', 'TLBR', 'order') "
            "— the reference's random order is 'order' with a shuffled "
            "positions array (imggen_model.py:78-90)")
    n_cells = grid_size * grid_size
    n_steps = n_steps or n_cells
    box_pos = jnp.asarray(box_position(grid_size))

    def _run(params, centroids, input_ids, attention_mask, positions):
        if positions is not None:
            if positions.shape[0] < n_steps:
                raise ValueError(
                    f"positions has {positions.shape[0]} entries for "
                    f"{n_steps} steps")
            # reference wraps positions into the grid (imggen_model.py:103)
            positions = positions % n_cells
        B = input_ids.shape[0]
        D = centroids.shape[1]
        pos = jnp.broadcast_to(box_pos[None], (B, n_cells, 4))
        code0 = jnp.zeros((B, n_cells, D), centroids.dtype)
        ids0 = jnp.zeros((B, n_cells), jnp.int32)
        vis_mask0 = jnp.ones((B, n_cells), jnp.float32)
        visited0 = jnp.zeros((B, n_cells), jnp.float32)

        def body(i, carry):
            code, ids, vis_mask, visited = carry
            if strategy in ("TLBR", "order"):
                cur = positions[i] if strategy == "order" else i % n_cells
                # re-mask the current position (supports >n_cells steps,
                # imggen_model.py:101-105)
                onehot_cur = jax.nn.one_hot(cur, n_cells, dtype=jnp.float32)
                vis_mask = jnp.maximum(vis_mask, onehot_cur[None, :])

            pred_prob, pred_id = _predict(
                model, params, input_ids, attention_mask, code, pos,
                vis_mask, centroids)

            if strategy == "confidence":
                scores = jnp.where(visited > 0, NEG, pred_prob)
                top = jnp.argmax(scores, axis=-1)  # (B,)
                update = jax.nn.one_hot(top, n_cells, dtype=jnp.float32)
            else:
                update = jnp.broadcast_to(onehot_cur[None, :], (B, n_cells))

            pred_code = jnp.take(centroids, pred_id, axis=0)
            m = update[..., None] > 0
            code = jnp.where(m, pred_code, code)
            ids = jnp.where(update > 0, pred_id, ids)
            vis_mask = vis_mask * (1.0 - update)
            visited = jnp.maximum(visited, update)
            return code, ids, vis_mask, visited

        code, ids, _, _ = jax.lax.fori_loop(
            0, n_steps, body, (code0, ids0, vis_mask0, visited0))
        return code, ids

    if strategy == "order":
        return jax.jit(_run)
    return jax.jit(functools.partial(_run, positions=None))
