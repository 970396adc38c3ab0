"""Int8 text-to-image sampling: NAR mask-predict through the
static-calibrated int8 engine.

The NAR decode loop (reference x-lxmert/src/tasks/imggen_model.py
:169-257, TPU-native transcription in tasks/sampling.py) spends ~all of
its encoder time in the same LXMERT forward the VQA engine serves — so
it gets the same treatment: every dense matmul int8 with static
calibrated activation scales (serving/lxmert_int8.py), including the
visual-cluster head's transform -> linear_feat -> (2048 x 10000)
centroid logits matmul.

Semantics match tasks/sampling.make_nar_sampler exactly, with two
serving-mode refinements:
  - cells are re-mask-ranked by per-cell max LOG-probability
    (max logit - logsumexp) instead of materializing the full
    (B, 64, 10000) softmax — the ranking is identical (monotone map),
    the returned per-cell probability is exp(logp) as before;
  - the 9-layer language stack runs ONCE outside the decode scan (the
    text is fixed across steps; only the x-layers mix modalities) —
    lxmert_int8.lang_encode / _predict_from_lang.

MEASURED on TPU v5e (B=64, 10k clusters, 256px SPADE render,
scripts/drive_sample_int8.py):
  NAR 4 steps:
    bf16 decode loop (tasks/sampling.py)        868-877 samples/s
    int8 loop, lang stack inside the scan       1000 samples/s
    int8 loop + cached lang stack               1073 samples/s
  AR 64 steps (confidence):
    bf16 decode loop                            108.2 samples/s
    int8 loop + cached lang stack               155.4 samples/s (+44%)

Calibration: `sampling_calibration_batches` builds code grids at the
mask ratios the decode loop actually visits (step 0 = all mask_feat,
later steps mostly committed centroids), so the static scales cover the
whole trajectory.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.ops.quant import quantize_weight
from xlxmert_tpu.serving.lxmert_int8 import (
    _ln, _qw, calibrate_forward, cross_encode, int8_dense_shared,
    lang_encode, layer_norm, prepare_params, visn_encode,
)
from xlxmert_tpu.utils.boxes import box_position


def prepare_sampler_params(xlx_params: Dict, cfg: LxmertConfig,
                           centroids: np.ndarray) -> Dict:
    """XLxmert param tree (models/xlxmert.py) -> int8 sampler tree:
    {"bert": <engine tree>, "obj_head": ..., "mask_feat": ...}."""
    oh = xlx_params["obj_predict_head"]
    return {
        "bert": prepare_params(xlx_params["bert"], cfg),
        "obj_head": {
            "transform": _qw(oh["transform"], "dense"),
            "ln": _ln(oh["transform"], "LayerNorm"),
            "linear_feat": _qw(oh, "linear_feat"),
            # out_cluster weight is TIED to the centroid table
            # (reference modeling.py:140-151): quantize centroids.T once
            "cluster": quantize_weight(
                np.asarray(centroids, np.float32).T,
                np.asarray(oh["out_cluster_bias"], np.float32)),
        },
        "mask_feat": jnp.asarray(
            np.asarray(xlx_params["mask_feat"], np.float32), jnp.bfloat16),
    }


def obj_head_forward(ohp: Dict, visn: jnp.ndarray) -> jnp.ndarray:
    """(B, V, H) -> (B, V, num_clusters) fp32 cluster logits."""
    h = int8_dense_shared(visn, ohp["transform"])
    h = jax.nn.gelu(h, approximate=True)
    h = layer_norm(h, ohp["ln"])
    feat = int8_dense_shared(h, ohp["linear_feat"])
    return int8_dense_shared(feat, ohp["cluster"]).astype(jnp.float32)


def _encode_from_lang(sp: Dict, lang, lang_bias, feats, pos,
                      n_heads: int):
    """Visual stack + x-layers -> final visual hidden states (B, V, H).
    The language stack is step-invariant (text fixed across decode
    steps) — callers run lang_encode ONCE and reuse (lang, lang_bias)."""
    visn, visn_bias = visn_encode(sp["bert"], feats, pos, None, n_heads)
    _, visn, _ = cross_encode(sp["bert"], lang, visn, lang_bias,
                              visn_bias, n_heads)
    return visn


def _predict_from_lang(sp: Dict, lang, lang_bias, feats, pos,
                       n_heads: int):
    """Decode-step half: visual stack + x-layers + cluster head."""
    visn = _encode_from_lang(sp, lang, lang_bias, feats, pos, n_heads)
    return obj_head_forward(sp["obj_head"], visn)


def _predict_forward(sp: Dict, input_ids, feats, pos, mask, n_heads: int):
    lang, lang_bias = lang_encode(sp["bert"], input_ids, mask, n_heads)
    return _predict_from_lang(sp, lang, lang_bias, feats, pos, n_heads)


def sampling_calibration_batches(sp: Dict, centroids, input_ids, mask,
                                 grid_size: int = 8, seed: int = 0):
    """Batches of (ids, feats, pos, mask) covering the decode-loop input
    distribution: all-masked (step 0), half-committed, mostly-committed."""
    n_cells = grid_size * grid_size
    B = input_ids.shape[0]
    pos = jnp.broadcast_to(
        jnp.asarray(box_position(grid_size))[None], (B, n_cells, 4)
    ).astype(jnp.bfloat16)
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, centroids.shape[0], (B, n_cells))
    codes = jnp.asarray(np.asarray(centroids)[ids], jnp.bfloat16)
    mask_feat = sp["mask_feat"][None, None, :]
    out = []
    for frac in (1.0, 0.5, 0.1):
        m = jnp.asarray(rng.rand(B, n_cells) < frac, jnp.bfloat16)[..., None]
        feats = m * mask_feat + (1 - m) * codes
        out.append((input_ids, feats, pos, mask))
    return out


def calibrate_sampler(sp: Dict, centroids, input_ids, mask,
                      cfg: LxmertConfig, grid_size: int = 8) -> Dict:
    """Static-scale calibration over the sampling input distribution."""
    batches = sampling_calibration_batches(sp, centroids, input_ids, mask,
                                           grid_size)

    def forward(sp_, ids, feats, pos, m):
        _predict_forward(sp_, ids, feats, pos, m,
                         cfg.num_attention_heads)

    return calibrate_forward(forward, (sp,), batches)


def make_nar_sampler_int8(cfg: LxmertConfig, n_steps: int,
                          grid_size: int = 8):
    """Jitted int8 NAR mask-predict sampler.

    Returns fn(sp, centroids, input_ids, attention_mask)
      -> (code (B,V,D) bf16, cluster_ids (B,V) int32, prob (B,V) fp32)
    with the exact commit/re-mask semantics of
    tasks/sampling.make_nar_sampler (reference imggen_model.py:169-257).
    """
    n_cells = grid_size * grid_size
    box_pos = jnp.asarray(box_position(grid_size))
    n_heads = cfg.num_attention_heads

    @jax.jit
    def sample(sp, centroids, input_ids, attention_mask):
        B = input_ids.shape[0]
        D = centroids.shape[1]
        centroids_bf16 = centroids.astype(jnp.bfloat16)
        pos = jnp.broadcast_to(box_pos[None], (B, n_cells, 4)).astype(
            jnp.bfloat16)
        code0 = jnp.zeros((B, n_cells, D), jnp.bfloat16)
        ids0 = jnp.zeros((B, n_cells), jnp.int32)
        prob0 = jnp.zeros((B, n_cells), jnp.float32)
        mask_feat = sp["mask_feat"][None, None, :]
        # text is fixed across decode steps: run the language stack once
        lang, lang_bias = lang_encode(sp["bert"], input_ids,
                                      attention_mask, n_heads)

        def step(carry, i):
            code, ids, prob = carry
            n_mask = ((n_steps - i) * n_cells) // n_steps
            ranks = jnp.argsort(jnp.argsort(prob, axis=-1), axis=-1)
            vis_mask = (ranks < n_mask).astype(jnp.float32)

            feats = jnp.where(vis_mask[..., None] > 0, mask_feat, code)
            logits = _predict_from_lang(sp, lang, lang_bias, feats, pos,
                                        n_heads)
            # max log-prob ranks identically to max softmax prob
            logp = (logits.max(axis=-1)
                    - jax.nn.logsumexp(logits, axis=-1))
            pred_prob = jnp.exp(logp)
            pred_id = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            pred_code = jnp.take(centroids_bf16, pred_id, axis=0)

            m = vis_mask[..., None] > 0
            code = jnp.where(m, pred_code, code)
            ids = jnp.where(vis_mask > 0, pred_id, ids)
            return (code, ids, pred_prob), None

        (code, ids, prob), _ = jax.lax.scan(
            step, (code0, ids0, prob0), jnp.arange(n_steps))
        return code, ids, prob

    return sample


def make_ar_sampler_int8(cfg: LxmertConfig, grid_size: int = 8,
                         strategy: str = "confidence",
                         n_steps=None, selective_head: bool = False):
    """Jitted int8 AR sampler (reference imggen_model.py:49-167, bf16
    transcription in tasks/sampling.make_ar_sampler). One cell committed
    per step over n_steps (default 64) full forwards — the cached
    language stack and int8 encoder pay off n_steps times here.

    strategy in {"confidence", "TLBR", "order"}; "order" consumes a
    caller-provided (n_steps,) position array.

    selective_head (TLBR/order only): these strategies commit exactly
    the CURRENT cell, so the 10k-way cluster head runs on that one cell
    instead of all 64 — the head is ~2.9 of the ~13 GFLOP/sample/step
    (transform 75M + linear_feat 201M + 2048x10000 logits 2.6G), so
    this removes ~22%% of the per-step FLOPs with BIT-IDENTICAL commits
    (int32 accumulation; the head row at `cur` is the same computation
    either way — pinned in tests/test_sampling_int8.py). The
    confidence strategy structurally needs every unvisited cell's
    max-probability, so it keeps the full head.

    Default OFF: measured SLOWER on the chip despite the FLOP cut —
    171.5 vs 178.8 samples/s TLBR full-head at B=64
    (scripts/drive_ar.py, round 4). The (B,1,·) head matmuls fall off
    the MXU's efficient tiling and the dynamic-slice gather at `cur`
    breaks fusion; the 22%% FLOP saving buys back less than the
    small-shape overhead costs. Kept because it is exact and wins
    nothing to remove; revisit at much larger grid sizes where the
    head share grows.

    Returns fn(sp, centroids, input_ids, attention_mask[, positions])
      -> (code, cluster_ids).
    """
    import functools

    if strategy not in ("confidence", "TLBR", "order"):
        raise ValueError(
            f"strategy {strategy!r} not in ('confidence', 'TLBR', 'order')")
    selective = selective_head and strategy in ("TLBR", "order")
    n_cells = grid_size * grid_size
    n_steps = n_steps or n_cells
    box_pos = jnp.asarray(box_position(grid_size))
    n_heads = cfg.num_attention_heads
    NEG = -10000.0  # matches reference masked_fill (imggen_model.py:141)

    def _run(sp, centroids, input_ids, attention_mask, positions):
        if positions is not None:
            if positions.shape[0] < n_steps:
                raise ValueError(
                    f"positions has {positions.shape[0]} entries for "
                    f"{n_steps} steps")
            positions = positions % n_cells  # imggen_model.py:103
        B = input_ids.shape[0]
        D = centroids.shape[1]
        centroids_bf16 = centroids.astype(jnp.bfloat16)
        pos = jnp.broadcast_to(box_pos[None], (B, n_cells, 4)).astype(
            jnp.bfloat16)
        code0 = jnp.zeros((B, n_cells, D), jnp.bfloat16)
        ids0 = jnp.zeros((B, n_cells), jnp.int32)
        vis_mask0 = jnp.ones((B, n_cells), jnp.float32)
        visited0 = jnp.zeros((B, n_cells), jnp.float32)
        mask_feat = sp["mask_feat"][None, None, :]
        lang, lang_bias = lang_encode(sp["bert"], input_ids,
                                      attention_mask, n_heads)

        def body(i, carry):
            code, ids, vis_mask, visited = carry
            if strategy in ("TLBR", "order"):
                cur = positions[i] if strategy == "order" else i % n_cells
                onehot_cur = jax.nn.one_hot(cur, n_cells,
                                            dtype=jnp.float32)
                vis_mask = jnp.maximum(vis_mask, onehot_cur[None, :])

            feats = jnp.where(vis_mask[..., None] > 0, mask_feat, code)
            if selective:
                # TLBR/order: only the current cell is committed — run
                # the 10k-way head on that one cell (bit-identical row)
                visn = _encode_from_lang(sp, lang, lang_bias, feats,
                                         pos, n_heads)
                visn_cur = jax.lax.dynamic_slice_in_dim(visn, cur, 1,
                                                        axis=1)
                logits = obj_head_forward(sp["obj_head"], visn_cur)
                pred_id = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                pred_id = jnp.broadcast_to(pred_id, (B, n_cells))
            else:
                logits = _predict_from_lang(sp, lang, lang_bias, feats,
                                            pos, n_heads)
                pred_id = jnp.argmax(logits, axis=-1).astype(jnp.int32)

            if strategy == "confidence":
                logp = (logits.max(axis=-1)
                        - jax.nn.logsumexp(logits, axis=-1))
                pred_prob = jnp.exp(logp)
                scores = jnp.where(visited > 0, NEG, pred_prob)
                top = jnp.argmax(scores, axis=-1)
                update = jax.nn.one_hot(top, n_cells, dtype=jnp.float32)
            else:
                update = jnp.broadcast_to(onehot_cur[None, :],
                                          (B, n_cells))

            pred_code = jnp.take(centroids_bf16, pred_id, axis=0)
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
