"""Int8 NAR sampling path: logit parity vs the fp32 model + loop mechanics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.models.xlxmert import XLxmert
from xlxmert_tpu.serving.lxmert_int8 import apply_calibration
from xlxmert_tpu.serving.sampling_int8 import (
    _predict_forward, calibrate_sampler, make_nar_sampler_int8,
    prepare_sampler_params,
)
from xlxmert_tpu.utils.boxes import box_position

CFG = LxmertConfig(
    vocab_size=89, hidden_size=32, num_attention_heads=4,
    intermediate_size=64, l_layers=2, x_layers=1, r_layers=1,
    visual_feat_dim=16, num_clusters=23)
GRID = 3
N_CELLS = GRID * GRID


@pytest.fixture(scope="module")
def setup():
    B, L = 3, 6
    rng = np.random.RandomState(0)
    model = XLxmert(CFG, dtype=jnp.float32)
    ids = jnp.asarray(rng.randint(1, CFG.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)
    centroids = rng.randn(CFG.num_clusters, CFG.visual_feat_dim).astype(
        np.float32) * 0.5
    code = jnp.asarray(centroids[rng.randint(0, CFG.num_clusters,
                                             (B, N_CELLS))])
    pos = jnp.broadcast_to(jnp.asarray(box_position(GRID))[None],
                           (B, N_CELLS, 4))
    params = model.init(jax.random.PRNGKey(0), ids, code, pos,
                        attention_mask=mask, centroids=jnp.asarray(centroids),
                        heads=("obj",))["params"]
    params = jax.tree.map(np.asarray, dict(params))
    params["mask_feat"] = rng.randn(CFG.visual_feat_dim).astype(
        np.float32) * 0.3

    sp = prepare_sampler_params(params, CFG, centroids)
    calib = calibrate_sampler(sp, jnp.asarray(centroids), ids, mask, CFG,
                              grid_size=GRID)
    ssp = apply_calibration(sp, calib)
    return model, params, ssp, centroids, ids, mask, code, pos


def test_obj_logits_parity(setup):
    model, params, ssp, centroids, ids, mask, code, pos = setup
    vm = jnp.asarray(
        np.random.RandomState(1).rand(*code.shape[:2]) < 0.5,
        jnp.float32)
    ref = model.apply({"params": params}, ids, code, pos,
                      attention_mask=mask, vis_mask=vm,
                      centroids=jnp.asarray(centroids), heads=("obj",),
                      deterministic=True)["obj_logits"]
    feats = jnp.where(vm[..., None] > 0,
                      ssp["mask_feat"][None, None, :].astype(jnp.float32),
                      code).astype(jnp.bfloat16)
    got = _predict_forward(ssp, ids, feats, pos.astype(jnp.bfloat16),
                           mask, CFG.num_attention_heads)
    a = np.asarray(ref, np.float32).ravel()
    b = np.asarray(got, np.float32).ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.98, cos


def test_nar_int8_loop_mechanics(setup):
    _, _, ssp, centroids, ids, mask, _, _ = setup
    n_steps = 3
    sampler = make_nar_sampler_int8(CFG, n_steps, grid_size=GRID)
    code, cl_ids, prob = sampler(ssp, jnp.asarray(centroids), ids, mask)
    B = ids.shape[0]
    assert code.shape == (B, N_CELLS, CFG.visual_feat_dim)
    assert cl_ids.shape == (B, N_CELLS)
    assert prob.shape == (B, N_CELLS)
    cl = np.asarray(cl_ids)
    assert (cl >= 0).all() and (cl < CFG.num_clusters).all()
    # every cell was committed at some step: final code rows must equal
    # the centroid of their cluster id (step0 masks all cells)
    want = np.asarray(centroids)[cl]
    np.testing.assert_allclose(np.asarray(code, np.float32), want,
                               atol=2e-2, rtol=1e-2)
    p = np.asarray(prob)
    assert ((p > 0) & (p <= 1.0 + 1e-6)).all()
    # deterministic
    code2, cl2, _ = sampler(ssp, jnp.asarray(centroids), ids, mask)
    np.testing.assert_array_equal(cl, np.asarray(cl2))


@pytest.mark.parametrize("strategy", ["confidence", "TLBR", "order"])
def test_ar_int8_commits_every_cell(setup, strategy):
    from xlxmert_tpu.serving.sampling_int8 import make_ar_sampler_int8

    _, _, ssp, centroids, ids, mask, _, _ = setup
    sampler = make_ar_sampler_int8(CFG, grid_size=GRID, strategy=strategy)
    args = (ssp, jnp.asarray(centroids), ids, mask)
    if strategy == "order":
        order = jnp.asarray(np.random.RandomState(5).permutation(N_CELLS))
        code, cl_ids = sampler(*args, order)
    else:
        code, cl_ids = sampler(*args)
    B = ids.shape[0]
    assert code.shape == (B, N_CELLS, CFG.visual_feat_dim)
    cl = np.asarray(cl_ids)
    assert (cl >= 0).all() and (cl < CFG.num_clusters).all()
    # one cell per step, n_cells steps -> every cell committed exactly once
    want = np.asarray(centroids)[cl]
    np.testing.assert_allclose(np.asarray(code, np.float32), want,
                               atol=2e-2, rtol=1e-2)


@pytest.mark.parametrize("strategy", ["TLBR", "order"])
def test_ar_selective_head_is_bit_identical(setup, strategy):
    """TLBR/order run the 10k-way cluster head on the current cell only
    (selective_head, the AR FLOP lever): int32 accumulation makes the
    single-row head equal the full-grid head's row exactly, so commits
    must be BIT-identical to the full-head path."""
    from xlxmert_tpu.serving.sampling_int8 import make_ar_sampler_int8

    _, _, ssp, centroids, ids, mask, _, _ = setup
    fast = make_ar_sampler_int8(CFG, grid_size=GRID, strategy=strategy)
    full = make_ar_sampler_int8(CFG, grid_size=GRID, strategy=strategy,
                                selective_head=False)
    args = (ssp, jnp.asarray(centroids), ids, mask)
    if strategy == "order":
        order = jnp.asarray(np.random.RandomState(7).permutation(N_CELLS))
        code_f, ids_f = fast(*args, order)
        code_r, ids_r = full(*args, order)
    else:
        code_f, ids_f = fast(*args)
        code_r, ids_r = full(*args)
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_r))
    np.testing.assert_array_equal(np.asarray(code_f), np.asarray(code_r))
