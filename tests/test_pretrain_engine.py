"""Pretraining engine tests on the virtual 8-device CPU mesh — a capability
the reference entirely lacks (its DDP paths are untestable without GPUs,
SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlxmert_tpu.core.config import LxmertConfig, TrainConfig
from xlxmert_tpu.tasks.pretrain import PretrainEngine, TrainState


TINY = LxmertConfig(
    vocab_size=150, hidden_size=32, num_attention_heads=4,
    intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
    visual_feat_dim=16, num_qa_labels=11, num_clusters=24)


def make_engine(task_qa=False, **cfg_kw):
    cfg = TrainConfig(batch_size=16, grid_size=4, num_clusters=24,
                      max_text_length=12, task_qa=task_qa,
                      mixed_precision=False, lr=1e-3, **cfg_kw)
    eng = PretrainEngine(cfg, model_cfg=TINY, total_steps=100)
    return eng


def make_batch(cfg, rng_seed=0, B=16):
    rng = np.random.RandomState(rng_seed)
    L, V = cfg.max_text_length, cfg.n_grids
    word_id = rng.randint(1, 150, (B, L)).astype(np.int32)
    word_id[:, 0] = 101
    return {
        "word_id": word_id,
        "other_word_id": rng.randint(1, 150, (B, L)).astype(np.int32),
        "matched_label": rng.randint(0, 2, (B,)).astype(np.int32),
        "cluster_id": rng.randint(0, 24, (B, V)).astype(np.int32),
        "vis_feats": rng.randn(B, V, 16).astype(np.float32),
        "qa_label": rng.randint(0, 11, (B,)).astype(np.int32),
    }


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("task", ["word_mask", "vis_mask", "matched"])
def test_train_step_runs_and_learns(task):
    eng = make_engine()
    state = eng.create_state(jax.random.PRNGKey(0))
    centroids = jnp.asarray(
        np.random.RandomState(1).randn(24, 16).astype(np.float32))
    step_fn = eng.train_step(task)
    batch = eng.place(make_batch(eng.cfg))
    rng = jax.random.PRNGKey(42)

    losses = []
    for i in range(8):
        state, metrics = step_fn(state, batch, rng, centroids)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses))
    # same batch re-fed: loss must drop
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_round_robin_and_qa():
    eng = make_engine(task_qa=True)
    assert eng.cfg.mask_modalities == ("vis_mask", "word_mask", "matched")
    assert eng.task_for_step(0) == "vis_mask"
    assert eng.task_for_step(1) == "word_mask"
    assert eng.task_for_step(2) == "matched"
    assert eng.task_for_step(3) == "vis_mask"

    state = eng.create_state(jax.random.PRNGKey(0))
    centroids = jnp.asarray(
        np.random.RandomState(1).randn(24, 16).astype(np.float32))
    batch = eng.place(make_batch(eng.cfg))
    rng = jax.random.PRNGKey(0)
    for i in range(3):
        task = eng.task_for_step(i)
        state, metrics = eng.train_step(task)(state, batch, rng, centroids)
        assert np.isfinite(float(metrics["total_loss"]))
        assert "qa_loss" in metrics


def test_eval_step_deterministic():
    eng = make_engine()
    state = eng.create_state(jax.random.PRNGKey(0))
    centroids = jnp.asarray(
        np.random.RandomState(1).randn(24, 16).astype(np.float32))
    batch = eng.place(make_batch(eng.cfg))
    es = eng.eval_step("matched")
    m1 = es(state.params, batch, jax.random.PRNGKey(5), centroids)
    m2 = es(state.params, batch, jax.random.PRNGKey(5), centroids)
    assert float(m1["total_loss"]) == float(m2["total_loss"])


def test_grad_sync_across_mesh():
    """Params must stay replica-identical after sharded-batch updates —
    the pjit equivalent of DDP's allreduce invariant."""
    eng = make_engine()
    state = eng.create_state(jax.random.PRNGKey(0))
    centroids = jnp.asarray(
        np.random.RandomState(1).randn(24, 16).astype(np.float32))
    batch = eng.place(make_batch(eng.cfg, rng_seed=3))
    state, _ = eng.train_step("word_mask")(
        state, batch, jax.random.PRNGKey(1), centroids)
    leaf = state.params["bert"]["pooler"]["dense"]["kernel"]
    # fully replicated output sharding
    assert leaf.sharding.is_fully_replicated


def test_non_clustering_with_feat_obj_attr_losses():
    """Detector-vocab mode: exact feats in, obj/attr/feat losses
    (reference non-clustering path, modeling.py:33-36,119-136)."""
    from xlxmert_tpu.core.config import LxmertConfig, TrainConfig
    from xlxmert_tpu.tasks.pretrain import PretrainEngine

    model_cfg = LxmertConfig(
        vocab_size=150, hidden_size=32, num_attention_heads=4,
        intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=16, num_object_labels=23, num_attr_labels=7,
        num_clusters=0)
    # grid_size=4 keeps the grid box-position fallback at 16 rows ==
    # n_boxes (the batch carries no per-image boxes)
    cfg = TrainConfig(batch_size=8, grid_model=False, n_boxes=16,
                      grid_size=4, clustering=False,
                      target_obj_id=True, feed_exact_feat=True,
                      visual_losses="obj,attr,feat", max_text_length=10,
                      mixed_precision=False, lr=1e-3)
    eng = PretrainEngine(cfg, model_cfg=model_cfg, total_steps=20)
    state = eng.create_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    B, L, V = 8, 10, 16
    batch = eng.place({
        "word_id": rng.randint(1, 150, (B, L)).astype(np.int32),
        "other_word_id": rng.randint(1, 150, (B, L)).astype(np.int32),
        "matched_label": rng.randint(0, 2, (B,)).astype(np.int32),
        "vis_feats": rng.randn(B, V, 16).astype(np.float32),
        "obj_id": rng.randint(0, 23, (B, V)).astype(np.int32),
        "attr_label": rng.randint(0, 7, (B, V)).astype(np.int32),
    })
    centroids = jnp.zeros((1, 16))
    state, m = eng.train_step("vis_mask")(state, batch,
                                          jax.random.PRNGKey(1), centroids)
    for k in ("obj_loss", "attr_loss", "feat_loss", "total_loss"):
        assert np.isfinite(float(m[k])), k


def test_chained_steps_match_sequential():
    """k chained scan steps == k sequential train_step calls exactly."""
    eng = make_engine()
    centroids = jnp.asarray(
        np.random.RandomState(1).randn(24, 16).astype(np.float32))
    batch = eng.place(make_batch(eng.cfg))
    rng = jax.random.PRNGKey(7)

    state_a = eng.create_state(jax.random.PRNGKey(0))
    losses = []
    for _ in range(3):
        state_a, m = eng.train_step("word_mask")(state_a, batch, rng,
                                                 centroids)
        losses.append(float(m["total_loss"]))

    state_b = eng.create_state(jax.random.PRNGKey(0))
    state_b, mean_loss = eng.chained_train_step("word_mask", 3)(
        state_b, batch, rng, centroids)

    assert int(np.asarray(state_b.step)) == 3
    np.testing.assert_allclose(float(mean_loss), np.mean(losses),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_chained_per_step_batches_match_sequential():
    """per_step_batches=True: k chained steps on k DISTINCT batches ==
    k sequential train_step calls on those batches."""
    eng = make_engine()
    centroids = jnp.asarray(
        np.random.RandomState(1).randn(24, 16).astype(np.float32))
    host_batches = [make_batch(eng.cfg, rng_seed=s) for s in range(3)]
    rng = jax.random.PRNGKey(7)

    state_a = eng.create_state(jax.random.PRNGKey(0))
    losses = []
    for hb in host_batches:
        state_a, m = eng.train_step("word_mask")(
            state_a, eng.place(hb), rng, centroids)
        losses.append(float(m["total_loss"]))

    state_b = eng.create_state(jax.random.PRNGKey(0))
    stacked = eng.place_stacked(host_batches)
    assert jax.tree.leaves(stacked)[0].shape[0] == 3
    state_b, mean_loss = eng.chained_train_step(
        "word_mask", 3, per_step_batches=True)(state_b, stacked, rng,
                                               centroids)

    assert int(np.asarray(state_b.step)) == 3
    np.testing.assert_allclose(float(mean_loss), np.mean(losses),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def make_bbox_engine(**cfg_kw):
    """Non-clustering bbox path (reference lxmert_pretrain.py:723-741):
    detector-vocab obj head, exact-feature input, per-image boxes."""
    model_cfg = LxmertConfig(
        vocab_size=150, hidden_size=32, num_attention_heads=4,
        intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=16, num_qa_labels=11, num_clusters=0,
        num_object_labels=21, num_attr_labels=9)
    kw = dict(batch_size=16, grid_model=False, n_boxes=6,
              clustering=False, num_clusters=0,
              target_obj_id=True, feed_exact_feat=True,
              target_exact_feat=True,
              max_text_length=12, mixed_precision=False, lr=3e-3)
    kw.update(cfg_kw)
    return PretrainEngine(TrainConfig(**kw), model_cfg=model_cfg,
                          total_steps=100)


def make_bbox_batch(cfg, rng_seed=0, B=16):
    rng = np.random.RandomState(rng_seed)
    L, V = cfg.max_text_length, cfg.n_vis
    word_id = rng.randint(1, 150, (B, L)).astype(np.int32)
    word_id[:, 0] = 101
    boxes = np.sort(rng.rand(B, V, 4).astype(np.float32), axis=-1)
    return {
        "word_id": word_id,
        "other_word_id": rng.randint(1, 150, (B, L)).astype(np.int32),
        "matched_label": rng.randint(0, 2, (B,)).astype(np.int32),
        "obj_id": rng.randint(0, 21, (B, V)).astype(np.int32),
        "vis_feats": rng.randn(B, V, 16).astype(np.float32),
        "boxes": boxes,
    }


def test_bbox_path_train_steps():
    """vis_mask on the bbox path: obj CE against detector ids through
    the out_obj head + SmoothL1 feat regression, real box positions."""
    eng = make_bbox_engine(visual_losses="obj,feat")
    assert eng.cfg.n_vis == 6
    state = eng.create_state(jax.random.PRNGKey(0))
    centroids = jnp.zeros((1, 16))  # unused on this path
    batch = eng.place(make_bbox_batch(eng.cfg))
    rng = jax.random.PRNGKey(42)

    losses = []
    for task in ("vis_mask", "word_mask", "matched", "vis_mask"):
        state, m = eng.train_step(task)(state, batch, rng, centroids)
        assert np.isfinite(float(m["total_loss"])), task
        losses.append(float(m["total_loss"]))
    m_keys = eng.eval_step("vis_mask")(state.params, batch,
                                       jax.random.PRNGKey(1), centroids)
    assert "obj_loss" in m_keys and "feat_loss" in m_keys

    # learning smoke: re-fed vis_mask loss drops (mean of the last few
    # steps vs the first — the random mask re-rolls per step)
    tail = []
    for _ in range(12):
        state, m = eng.train_step("vis_mask")(state, batch, rng, centroids)
        tail.append(float(m["total_loss"]))
    assert np.mean(tail[-3:]) < losses[0]


def test_bbox_path_without_target_obj_id_skips_obj_loss():
    """No label source for obj -> no obj loss, like the reference's
    forward which only fills obj_labels under clustering/target_obj_id
    (lxmert_pretrain.py:162-170)."""
    eng = make_bbox_engine(visual_losses="obj,feat", target_obj_id=False)
    state = eng.create_state(jax.random.PRNGKey(0))
    batch = eng.place(make_bbox_batch(eng.cfg))
    m = eng.eval_step("vis_mask")(state.params, batch,
                                  jax.random.PRNGKey(1), jnp.zeros((1, 16)))
    assert "obj_loss" not in m and "feat_loss" in m


def test_grid_exact_feat_path_train_steps():
    """Non-clustering GRID variant (reference lxmert_data.py:186-193
    routes grid_model runs to grid h5): exact grid features are the
    visual input, feat loss on masked cells, grid box positions, no obj
    labels (grid h5 has no obj ids)."""
    model_cfg = LxmertConfig(
        vocab_size=150, hidden_size=32, num_attention_heads=4,
        intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=16, num_qa_labels=11, num_clusters=0)
    cfg = TrainConfig(batch_size=16, grid_size=4, clustering=False,
                      grid_model=True, feed_exact_feat=True,
                      target_exact_feat=True, visual_losses="obj,feat",
                      max_text_length=12, mixed_precision=False, lr=3e-3)
    eng = PretrainEngine(cfg, model_cfg=model_cfg, total_steps=100)
    assert eng.cfg.n_vis == 16  # grid_size^2, not n_boxes

    rng_np = np.random.RandomState(0)
    B, L, V = 16, 12, 16
    word_id = rng_np.randint(1, 150, (B, L)).astype(np.int32)
    word_id[:, 0] = 101
    batch = eng.place({
        "word_id": word_id,
        "other_word_id": rng_np.randint(1, 150, (B, L)).astype(np.int32),
        "matched_label": rng_np.randint(0, 2, (B,)).astype(np.int32),
        "vis_feats": rng_np.randn(B, V, 16).astype(np.float32),
    })
    state = eng.create_state(jax.random.PRNGKey(0))
    centroids = jnp.zeros((1, 16))
    rng = jax.random.PRNGKey(42)
    first = None
    for task in ("vis_mask", "word_mask", "matched"):
        state, m = eng.train_step(task)(state, batch, rng, centroids)
        assert np.isfinite(float(m["total_loss"])), task
        if first is None:
            first = float(m["total_loss"])
    m = eng.eval_step("vis_mask")(state.params, batch,
                                  jax.random.PRNGKey(1), centroids)
    # no obj-label source on the grid path -> feat loss only
    assert "feat_loss" in m and "obj_loss" not in m
    assert float(m["feat_loss"]) > 0  # masked-cell regression engaged
    # (no learning-smoke here: the SmoothL1 feat loss regresses random
    # synthetic features, whose loss floor is the target variance — the
    # bbox tests cover convergence via the obj CE head)
    del first


def test_config_guards_for_impossible_combos():
    """Fail-fast guards for combinations whose shapes can only die
    inside the jitted step (or that the reference itself cannot run)."""
    with pytest.raises(ValueError, match="square_mask"):
        TrainConfig(clustering=False, grid_model=False, square_mask=True)
    with pytest.raises(ValueError, match="target_obj_id"):
        TrainConfig(clustering=False, grid_model=True, target_obj_id=True)
    with pytest.raises(ValueError, match="grid_model"):
        TrainConfig(clustering=True, grid_model=False)


def test_clustering_feat_loss_needs_exact_flags():
    """Under clustering, the feat loss only engages with
    --feed/--target_exact_feat (reference data_out 'feat',
    lxmert_pretrain.py:733) — without them the head and labels are
    skipped instead of KeyError-ing on absent vis_feats."""
    eng = make_engine(visual_losses="obj,feat")  # clustering, no flags
    state = eng.create_state(jax.random.PRNGKey(0))
    centroids = jnp.asarray(
        np.random.RandomState(1).randn(24, 16).astype(np.float32))
    batch = make_batch(eng.cfg)
    batch.pop("vis_feats")  # what the loader emits without the flags
    m = eng.eval_step("vis_mask")(state.params, eng.place(batch),
                                  jax.random.PRNGKey(1), centroids)
    assert "obj_loss" in m and "feat_loss" not in m

    # with the flag, vis_feats are loaded and the loss engages
    eng2 = make_engine(visual_losses="obj,feat", target_exact_feat=True)
    state2 = eng2.create_state(jax.random.PRNGKey(0))
    m2 = eng2.eval_step("vis_mask")(
        state2.params, eng2.place(make_batch(eng2.cfg)),
        jax.random.PRNGKey(1), centroids)
    assert "feat_loss" in m2


def test_pretrain_losses_torch_oracle():
    """Pin the loss COMPOSITION (unweighted obj+attr+feat sum, SmoothL1
    masked-mean formula, lm/matched/qa CE) value-for-value against a
    torch transcription of the reference's loss section
    (lxrt/modeling.py:216-307, loss_fcts :96-103). The trajectory tests
    pin the clustering path end-to-end; this pins the detector-vocab
    composition itself, so a drifted per-loss weight fails here even
    though the engine smoke tests only check finiteness."""
    import torch
    import torch.nn.functional as F

    from xlxmert_tpu.models.xlxmert import pretrain_losses

    rng = np.random.RandomState(7)
    B, L, V, D = 6, 12, 16, 16
    n_obj, n_attr, n_vocab, n_qa = 23, 7, 150, 11
    out = {
        "lm_logits": rng.randn(B, L, n_vocab).astype(np.float32),
        "matched_logits": rng.randn(B, 2).astype(np.float32),
        "obj_logits": rng.randn(B, V, n_obj).astype(np.float32),
        "attr_logits": rng.randn(B, V, n_attr).astype(np.float32),
        "feat_pred": rng.randn(B, V, D).astype(np.float32),
        "qa_logits": rng.randn(B, n_qa).astype(np.float32),
    }
    word_labels = rng.randint(0, n_vocab, (B, L)).astype(np.int32)
    word_labels[rng.rand(B, L) < 0.8] = -1  # unmasked positions ignored
    vis_mask = (rng.rand(B, V) < 0.4).astype(np.float32)
    vis_mask[:, 0] = 1.0
    labels = {
        "word_labels": word_labels,
        "matched_labels": rng.randint(0, 2, (B,)).astype(np.int32),
        "obj_labels": rng.randint(0, n_obj, (B, V)).astype(np.int32),
        "attr_labels": rng.randint(0, n_attr, (B, V)).astype(np.int32),
        "feat_labels": rng.randn(B, V, D).astype(np.float32),
        "vis_mask": vis_mask,
        "qa_labels": rng.randint(0, n_qa, (B,)).astype(np.int32),
    }
    jx = {k: jnp.asarray(v) for k, v in out.items()}
    jl = {k: jnp.asarray(v) for k, v in labels.items()}

    def tt(x):
        return torch.from_numpy(np.asarray(x))

    # torch transcription: CrossEntropyLoss() means over non-ignored;
    # feat = SmoothL1(none).mean(dim=2) -> *vis_mask sum / clamp(n,1) -> mean
    ce = torch.nn.CrossEntropyLoss(ignore_index=-1)
    ref = {}
    ref["lm_loss"] = ce(tt(out["lm_logits"]).view(-1, n_vocab),
                        tt(word_labels).long().view(-1))
    ref["matched_loss"] = ce(tt(out["matched_logits"]),
                             tt(labels["matched_labels"]).long())
    ref["obj_loss"] = ce(tt(out["obj_logits"]).view(B * V, n_obj),
                         tt(labels["obj_labels"]).long().flatten())
    ref["attr_loss"] = ce(tt(out["attr_logits"]).view(B * V, n_attr),
                          tt(labels["attr_labels"]).long().flatten())
    fl = F.smooth_l1_loss(tt(out["feat_pred"]), tt(labels["feat_labels"]),
                          reduction="none").mean(dim=2)
    fl = (fl * tt(vis_mask)).sum(dim=1) / tt(vis_mask).sum(dim=1).clamp(min=1)
    ref["feat_loss"] = fl.mean()
    ref["qa_loss"] = ce(tt(out["qa_logits"]), tt(labels["qa_labels"]).long())
    ref["vis_loss"] = ref["obj_loss"] + ref["attr_loss"] + ref["feat_loss"]

    for task, keys in (
        ("word_mask", ["lm_loss"]),
        ("matched", ["matched_loss"]),
        ("vis_mask", ["obj_loss", "attr_loss", "feat_loss", "vis_loss"]),
    ):
        got = pretrain_losses(jx, jl, task,
                              visual_loss_keys=("obj", "attr", "feat"),
                              task_qa=True)
        expect_total = sum(float(ref[k]) for k in keys
                           if k != "vis_loss") + float(ref["qa_loss"])
        for k in keys + ["qa_loss"]:
            np.testing.assert_allclose(float(got[k]), float(ref[k]),
                                       rtol=2e-6, atol=2e-6, err_msg=k)
        np.testing.assert_allclose(float(got["total_loss"]), expect_total,
                                   rtol=2e-6, atol=2e-6, err_msg=task)
