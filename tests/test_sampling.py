"""Sampler tests: the jitted lax.fori_loop decode loops must reproduce a
literal step-by-step re-implementation of the reference control flow
(imggen_model.py:49-257) exactly, plus schedule property checks."""
import jax
import jax.numpy as jnp
import numpy as np

from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.models.xlxmert import XLxmert
from xlxmert_tpu.tasks.sampling import (
    make_ar_sampler, make_nar_sampler, nar_mask_counts,
)
from xlxmert_tpu.utils.boxes import box_position

TINY = LxmertConfig(
    vocab_size=64, hidden_size=32, num_attention_heads=4,
    intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
    visual_feat_dim=16, num_clusters=20)
GRID = 4
N_CELLS = GRID * GRID


def setup_model(seed=0):
    model = XLxmert(TINY, dtype=jnp.float32)
    rng = np.random.RandomState(seed)
    B, L = 2, 6
    ids = jnp.asarray(rng.randint(1, 64, (B, L)).astype(np.int32))
    mask = jnp.asarray((rng.rand(B, L) > 0.1).astype(np.float32))
    centroids = jnp.asarray(rng.randn(20, 16).astype(np.float32))
    params = model.init(
        jax.random.PRNGKey(seed), ids,
        jnp.zeros((B, N_CELLS, 16)), jnp.zeros((B, N_CELLS, 4)),
        attention_mask=mask, vis_mask=jnp.ones((B, N_CELLS)),
        centroids=centroids,
        heads=("obj",), deterministic=True)["params"]
    return model, params, centroids, ids, mask


def ref_predict(model, params, ids, mask, code, pos, vis_mask, centroids):
    out = model.apply({"params": params}, ids, code, pos,
                      attention_mask=mask, vis_mask=vis_mask,
                      centroids=centroids, heads=("obj",), deterministic=True)
    probs = jax.nn.softmax(np.asarray(out["obj_logits"], np.float32), axis=-1)
    return np.max(probs, -1), np.argmax(probs, -1)


def ref_nar(model, params, centroids, ids, mask, n_steps):
    """Literal transcription of sample_image_NAR (imggen_model.py:199-243)."""
    B = ids.shape[0]
    pos = jnp.broadcast_to(jnp.asarray(box_position(GRID))[None], (B, N_CELLS, 4))
    code = np.zeros((B, N_CELLS, 16), np.float32)
    pred_prob = None
    cent = np.asarray(centroids)
    for i in range(n_steps):
        n_mask = int((n_steps - i) / n_steps * N_CELLS)
        if i == 0:
            vis_mask = np.ones((B, N_CELLS), np.float32)
        else:
            vis_mask = np.zeros((B, N_CELLS), np.float32)
            lowest = np.argsort(pred_prob, axis=1, kind="stable")[:, :n_mask]
            for b in range(B):
                vis_mask[b, lowest[b]] = 1
        pred_prob, pred_id = ref_predict(
            model, params, ids, mask, jnp.asarray(code), pos,
            jnp.asarray(vis_mask), centroids)
        pred_code = cent[pred_id]
        code = np.where(vis_mask[..., None] > 0, pred_code, code)
    return code


def test_nar_matches_reference_loop():
    model, params, centroids, ids, mask = setup_model()
    n_steps = 4
    sampler = make_nar_sampler(model, n_steps, GRID)
    code, out_ids, prob = sampler(params, centroids, ids, mask)
    ref_code = ref_nar(model, params, centroids, ids, mask, n_steps)
    np.testing.assert_allclose(np.asarray(code), ref_code, atol=2e-5, rtol=1e-4)
    # ids consistent with code
    np.testing.assert_allclose(
        np.asarray(code), np.asarray(centroids)[np.asarray(out_ids)],
        atol=2e-5, rtol=1e-4)


def test_nar_schedule():
    assert nar_mask_counts(4, 64) == [64, 48, 32, 16]
    assert nar_mask_counts(8, 64) == [64, 56, 48, 40, 32, 24, 16, 8]


def ref_ar_confidence(model, params, centroids, ids, mask, n_steps):
    """Literal transcription of sample_image_AR confidence mode
    (imggen_model.py:92-153)."""
    B = ids.shape[0]
    pos = jnp.broadcast_to(jnp.asarray(box_position(GRID))[None], (B, N_CELLS, 4))
    code = np.zeros((B, N_CELLS, 16), np.float32)
    vis_mask = np.ones((B, N_CELLS), np.float32)
    visited = np.zeros((B, N_CELLS), np.float32)
    cent = np.asarray(centroids)
    for i in range(n_steps):
        pred_prob, pred_id = ref_predict(
            model, params, ids, mask, jnp.asarray(code), pos,
            jnp.asarray(vis_mask), centroids)
        scores = np.where(visited > 0, -10000.0, pred_prob)
        top = np.argmax(scores, axis=1)
        update = np.zeros((B, N_CELLS), np.float32)
        update[np.arange(B), top] = 1
        vis_mask = vis_mask * (1 - update)
        visited = np.maximum(visited, update)
        code = np.where(update[..., None] > 0, cent[pred_id], code)
    return code, visited


def test_ar_confidence_matches_reference_loop():
    model, params, centroids, ids, mask = setup_model(seed=3)
    sampler = make_ar_sampler(model, GRID, "confidence")
    code, out_ids = sampler(params, centroids, ids, mask)
    ref_code, visited = ref_ar_confidence(
        model, params, centroids, ids, mask, N_CELLS)
    assert visited.sum() == 2 * N_CELLS  # every cell committed exactly once
    np.testing.assert_allclose(np.asarray(code), ref_code, atol=2e-5, rtol=1e-4)


def test_ar_tlbr_commits_in_order():
    model, params, centroids, ids, mask = setup_model(seed=5)
    sampler = make_ar_sampler(model, GRID, "TLBR", n_steps=3)
    code, out_ids = sampler(params, centroids, ids, mask)
    code = np.asarray(code)
    # first 3 cells committed (non-zero), rest still zero
    assert (np.abs(code[:, :3]).sum(axis=-1) > 0).all()
    assert (np.abs(code[:, 3:]).sum() == 0)


def test_ar_order_strategy():
    model, params, centroids, ids, mask = setup_model(seed=7)
    order = jnp.asarray(np.random.RandomState(1).permutation(N_CELLS))
    sampler = make_ar_sampler(model, GRID, "order")
    code, out_ids = sampler(params, centroids, ids, mask, order)
    # all cells committed after a full pass
    assert (np.abs(np.asarray(code)).sum(axis=-1) > 0).all()


def test_ar_order_wraps_and_validates_positions():
    """Reference semantics: positions wrap into the grid (% n_grids,
    imggen_model.py:103); short position arrays and unknown strategies
    fail loudly at build/call time instead of silently clamping."""
    import pytest

    model, params, centroids, ids, mask = setup_model(seed=7)
    base = jnp.asarray(np.random.RandomState(1).permutation(N_CELLS))
    sampler = make_ar_sampler(model, GRID, "order")
    _, ref_ids = sampler(params, centroids, ids, mask, base)
    # +N_CELLS wraps to the same order -> identical commitment pattern
    _, wrap_ids = sampler(params, centroids, ids, mask, base + N_CELLS)
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(wrap_ids))

    with pytest.raises(ValueError, match="entries for"):
        sampler(params, centroids, ids, mask, base[: N_CELLS // 2])
    with pytest.raises(ValueError, match="strategy"):
        make_ar_sampler(model, GRID, "random")


def test_nar_collect_intermediate():
    model, params, centroids, ids, mask = setup_model(seed=9)
    sampler = make_nar_sampler(model, 3, GRID, collect_intermediate=True)
    codes, out_ids, prob = sampler(params, centroids, ids, mask)
    assert codes.shape == (3, 2, N_CELLS, 16)
    assert out_ids.shape == (3, 2, N_CELLS)
    # final step must equal the non-collecting sampler's result
    final_code, final_ids, _ = make_nar_sampler(model, 3, GRID)(
        params, centroids, ids, mask)
    np.testing.assert_allclose(np.asarray(codes[-1]), np.asarray(final_code),
                               atol=1e-6)
