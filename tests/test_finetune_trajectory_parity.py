"""Finetune-trainer trajectory parity: N full VQA/NLVR2 updates vs torch
transcriptions of the reference Trainers (VERDICT r4 item #2).

test_trainer_trajectory_parity.py pins the PRETRAIN step; this pins the
finetune recipes: BCE-with-logits vs soft targets + HF AdamW + linear
warmup (vqa.py:87-118,187), the update_freq accumulation gate with its
step-0 skip and epoch-end flush (vqa.py:151-159) — raw grad SUMS, clip
applied to the accumulated sum, scheduler advancing only on update
steps — and NLVR2's 2-image flatten + repeated sentence + CE
(nlvr2_model.py:61-86, nlvr2.py:159-171). Both frameworks start from
identical converted weights and consume identical batches; per-step
losses AND final parameters must agree at fp32 tolerance.

Reference bugs transcribed as *intent* (the shipped code cannot run):
  - vqa.py:162-164 calls `self.model.train_step(batch)` — no such method
    exists on VQAModel -> AttributeError. The real forward at :176-181 is
    what we transcribe (single forward per batch).
  - vqa_model.py:19 `self._init_weights(self.logit_fc)` — logit_fc is a
    child of answer_head, not of VQAModel -> AttributeError.
  - nlvr2_model.py:18,85 constructs `logit_fc` but calls `answer_head`,
    and feeds a (B, 2*hidden) tensor to a head whose first Linear takes
    hidden -> shape error. Intent = original LXMERT NLVR2 head over the
    concatenated pooled pair; our VisualAnswerHead matches since its
    first dense outputs 2*hidden from any input width.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlxmert_tpu.core.config import FinetuneConfig, LxmertConfig
from xlxmert_tpu.core.convert import convert_torch_state_dict
from xlxmert_tpu.tasks.finetune import FinetuneEngine, should_update

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from transformers.models.lxmert import modeling_lxmert as hf  # noqa: E402
import torch.nn as tnn  # noqa: E402

from test_trainer_trajectory_parity import LegacyAdamW  # noqa: E402

B, L, G = 8, 8, 3
V = G * G
FEAT_DIM = 24
NUM_ANSWERS = 13
LR = 2e-3
TOTAL_STEPS = 12
WARMUP_RATIO = 0.25   # warmup = 3: the pinned window crosses the kink
WD = 0.01
CLIP = 1.0
EPS = 1e-6
N_STEPS = 6

CFG_KW = dict(
    vocab_size=111, hidden_size=48, num_attention_heads=4,
    intermediate_size=96, l_layers=2, x_layers=1, r_layers=1,
    visual_feat_dim=FEAT_DIM, visual_pos_dim=4, num_qa_labels=NUM_ANSWERS,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)


def hf_config():
    return transformers.LxmertConfig(**CFG_KW)


def _mult(sched_step):
    """get_linear_schedule_with_warmup's lambda (vqa.py:115-116) at the
    reference's horizon t_total = batch_per_epoch * epochs — denominated
    in BATCHES even though the scheduler steps once per UPDATE."""
    warmup = max(int(TOTAL_STEPS * WARMUP_RATIO), 1)
    if sched_step < warmup:
        return sched_step / warmup
    return max(0.0, (TOTAL_STEPS - sched_step) / (TOTAL_STEPS - warmup))


def _clip_(params):
    grads = [p.grad for p in params if p.grad is not None]
    total = torch.norm(torch.stack([g.norm(2) for g in grads]), 2)
    coef = CLIP / (total + 1e-6)
    if coef < 1:
        for g in grads:
            g.mul_(coef)


class RefVQAModel(tnn.Module):
    """vqa_model.py:7-72 intent (see module docstring for the shipped
    bugs): bert + LxmertVisualAnswerHead over pooled [CLS]."""

    def __init__(self, cfg):
        super().__init__()
        self.bert = hf.LxmertModel(cfg)
        self.answer_head = hf.LxmertVisualAnswerHead(cfg, NUM_ANSWERS)

    def forward(self, ids, feats, pos):
        out = self.bert(input_ids=ids, visual_feats=feats, visual_pos=pos,
                        attention_mask=(ids > 0).float(), return_dict=True)
        return self.answer_head(out.pooled_output)


class RefNLVR2Head(tnn.Module):
    """LxmertVisualAnswerHead shape-fixed for the (B, 2*hidden) input
    (nlvr2_model.py intent): in -> 2*hid -> GeLU -> LN -> 2."""

    def __init__(self, cfg):
        super().__init__()
        h2 = cfg.hidden_size * 2
        self.logit_fc = tnn.Sequential(
            tnn.Linear(h2, h2), hf.GeLU(), tnn.LayerNorm(h2, eps=1e-12),
            tnn.Linear(h2, 2))

    def forward(self, x):
        return self.logit_fc(x)


class RefNLVR2Model(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.hidden = cfg.hidden_size
        self.bert = hf.LxmertModel(cfg)
        self.logit_fc = RefNLVR2Head(cfg)

    def forward(self, ids, feats, pos):
        Bn, n_images, V_L, D = feats.size()
        assert n_images == 2
        feats = feats.view(Bn * 2, V_L, D)
        pos = pos.view(Bn * 2, V_L, -1)
        # sentence repeated per image (nlvr2.py:159)
        ids = ids.unsqueeze(1).repeat(1, 2, 1).view(Bn * 2, -1)
        out = self.bert(input_ids=ids, visual_feats=feats, visual_pos=pos,
                        attention_mask=(ids > 0).float(), return_dict=True)
        pooled = out.pooled_output.view(Bn, 2 * self.hidden)
        return self.logit_fc(pooled)


def make_vqa_batches(n, seed=0):
    r = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        ids = r.randint(1, CFG_KW["vocab_size"], (B, L)).astype(np.int32)
        ids[:, 0] = 1
        ids[0, L - 2:] = 0  # padding row exercises the mask
        soft = r.rand(B, NUM_ANSWERS).astype(np.float32)
        out.append({
            "word_ids": ids,
            "vis_feats": r.randn(B, V, FEAT_DIM).astype(np.float32) * 0.5,
            "boxes": r.rand(B, V, 4).astype(np.float32),
            "targets": soft / soft.sum(1, keepdims=True),
        })
    return out


def make_nlvr2_batches(n, seed=1):
    r = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        ids = r.randint(1, CFG_KW["vocab_size"], (B, L)).astype(np.int32)
        ids[:, 0] = 1
        out.append({
            "word_ids": ids,
            "vis_feats": r.randn(B, 2, V, FEAT_DIM).astype(np.float32) * 0.5,
            "boxes": r.rand(B, 2, V, 4).astype(np.float32),
            "labels": r.randint(0, 2, (B,)).astype(np.int32),
        })
    return out


def test_should_update_transcribes_reference_gate():
    """Pin the gate against a literal transcription of vqa.py:151-159."""
    for n_batches, k in [(6, 2), (7, 3), (5, 1), (9, 4)]:
        for step_i in range(n_batches):
            update = True
            if k > 1:
                if step_i == 0:
                    update = False
                elif step_i % k == 0 or step_i == n_batches - 1:
                    update = True
                else:
                    update = False
            assert should_update(step_i, n_batches, k) == update, (
                f"gate drift at step {step_i} (n={n_batches}, k={k})")


def _finetune_engine(task, update_freq):
    cfg = FinetuneConfig(
        task=task, batch_size=B, max_text_length=L, grid_size=G,
        mixed_precision=False, lr=LR, warmup_ratio=WARMUP_RATIO,
        weight_decay=WD, clip_grad_norm=CLIP, adam_eps=EPS,
        update_freq=update_freq)
    mcfg = LxmertConfig(**CFG_KW)
    return FinetuneEngine(cfg, NUM_ANSWERS if task != "nlvr2" else 2,
                          model_cfg=mcfg, total_steps=TOTAL_STEPS)


def _assert_param_parity(state, tmodel, drop=()):
    final = jax.device_get(state.params)
    tsd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
           if k not in drop}
    tfinal = convert_torch_state_dict(tsd)
    for (pj, lj), (pt, lt) in zip(
            jax.tree_util.tree_leaves_with_path(final),
            jax.tree_util.tree_leaves_with_path(tfinal)):
        assert jax.tree_util.keystr(pj) == jax.tree_util.keystr(pt)
        np.testing.assert_allclose(
            np.asarray(lj), lt, atol=6 * LR, rtol=0.05,
            err_msg=f"param drift at {jax.tree_util.keystr(pj)}")


def test_vqa_trajectory_parity_update_freq2():
    """6 batches, update_freq=2: updates fire at steps 2 (covering THREE
    batches — the reference's step-0 skip), 4, and 5 (epoch-end flush).
    Pins BCE + accumulation-sum + clip-on-sum + scheduler-per-update."""
    torch.manual_seed(7)
    tmodel = RefVQAModel(hf_config())
    tmodel.train()

    eng = _finetune_engine("vqa", update_freq=2)
    params = convert_torch_state_dict(tmodel.state_dict())
    ref_tree = eng.init_params(jax.random.PRNGKey(0))
    assert jax.tree.structure(params) == jax.tree.structure(ref_tree)
    state = eng.create_state(
        jax.random.PRNGKey(0),
        params=jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params))
    step_fn = eng.train_step()

    batches = make_vqa_batches(N_STEPS)
    opt = LegacyAdamW(tmodel.named_parameters(), WD)
    bce = tnn.BCEWithLogitsLoss()
    rng = jax.random.PRNGKey(5)

    n_updates = 0
    t_losses, j_losses = [], []
    for i, b in enumerate(batches):
        do_update = should_update(i, N_STEPS, 2)
        # torch reference step (vqa.py:151-198): backward accumulates raw
        # grad sums; on update: clip the SUM, step, scheduler, grads=None
        logit = tmodel(torch.from_numpy(b["word_ids"]).long(),
                       torch.from_numpy(b["vis_feats"]),
                       torch.from_numpy(b["boxes"]))
        loss = bce(logit, torch.from_numpy(b["targets"]))
        loss.backward()
        if do_update:
            _clip_([p for _, p in tmodel.named_parameters()])
            opt.step(LR * _mult(n_updates))
            n_updates += 1
            for _, p in tmodel.named_parameters():
                p.grad = None
        t_losses.append(float(loss.detach()))
        # our step
        state, metrics = step_fn(state, eng.place(b), rng,
                                 jnp.asarray(do_update))
        j_losses.append(float(np.asarray(metrics["loss"])))

    assert n_updates == 3  # steps 2, 4, 5
    # losses through step 4 are pure forward parity: the step-2 update
    # uses lr_mult(0)=0 (warmup step 0), so params first move at step 4
    np.testing.assert_allclose(j_losses[:5], t_losses[:5], rtol=2e-6)
    # after the first effective update: BCE's landscape at random init is
    # steep and Adam's first step is sign(g)-saturated, so fp32 backward
    # noise flips near-zero-grad update signs (debug: per-leaf param
    # diffs are all <= one update step, concentrated in the embedding
    # tables) — a ~2e-2 loss band is the cross-framework chaos floor
    # here. Semantics are pinned exactly by the param envelope + count
    # checks below and test_accum_state_reference_sums_synthetic.
    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-2)
    assert abs(t_losses[0] - t_losses[-1]) > 1e-5  # it moved
    _assert_param_parity(state, tmodel)
    # optimizer stepped exactly on the gate steps: every leaf count == 3
    counts = set(int(c) for c in jax.tree.leaves(
        jax.device_get(state.opt_state.count)))
    assert counts == {3}


def test_nlvr2_trajectory_parity():
    """4 plain (update_freq=1) steps: pins the 2-image flatten + repeated
    sentence + CE loss + per-batch update path."""
    torch.manual_seed(9)
    tmodel = RefNLVR2Model(hf_config())
    tmodel.train()

    eng = _finetune_engine("nlvr2", update_freq=1)
    params = convert_torch_state_dict(tmodel.state_dict())
    ref_tree = eng.init_params(jax.random.PRNGKey(0))
    assert jax.tree.structure(params) == jax.tree.structure(ref_tree)
    state = eng.create_state(
        jax.random.PRNGKey(0),
        params=jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params))
    step_fn = eng.train_step()

    batches = make_nlvr2_batches(4)
    opt = LegacyAdamW(tmodel.named_parameters(), WD)
    ce = tnn.CrossEntropyLoss()
    rng = jax.random.PRNGKey(5)

    t_losses, j_losses = [], []
    for k, b in enumerate(batches):
        logit = tmodel(torch.from_numpy(b["word_ids"]).long(),
                       torch.from_numpy(b["vis_feats"]),
                       torch.from_numpy(b["boxes"]))
        loss = ce(logit, torch.from_numpy(b["labels"]).long())
        loss.backward()
        _clip_([p for _, p in tmodel.named_parameters()])
        opt.step(LR * _mult(k))
        for _, p in tmodel.named_parameters():
            p.grad = None
        t_losses.append(float(loss.detach()))

        state, metrics = step_fn(state, eng.place(b), rng)
        j_losses.append(float(np.asarray(metrics["loss"])))

    # steps 0-1 precede any effective update (step-0 update has lr 0)
    np.testing.assert_allclose(j_losses[:2], t_losses[:2], rtol=2e-6)
    # post-update: 2-way CE logits at random init are near-tie, so the
    # sign-saturated-Adam chaos floor (see the VQA test) is ~3-4e-2 here;
    # semantic drift is pinned by the param envelope below instead
    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-2)
    _assert_param_parity(state, tmodel)


def test_accum_state_reference_sums_synthetic():
    """AccumTrainState vs a torch transcription on SYNTHETIC grads — no
    model chaos, near-bitwise tolerance. Gradients include a near-eps
    leaf where Adam is LINEAR in the accumulated grad (update ~
    lr*(1-b1)*g_acc/eps), so raw-SUM accumulation (reference
    loss.backward semantics) and MEAN accumulation (optax.MultiSteps)
    differ by ~k there — this test fails under mean semantics. Clip is
    off (vqa.py --no_clip_grad path) because clipping normalizes the
    sum/mean direction difference away."""
    import math

    from xlxmert_tpu.core.optim import make_optimizer
    from xlxmert_tpu.tasks.finetune import AccumTrainState

    LRo, TOT, WRATIO, WDo, EPSo = 1e-2, 10, 0.2, 0.013, 1e-6
    r = np.random.RandomState(5)
    W = r.randn(6, 5).astype(np.float32)
    t = (r.randn(4).astype(np.float32) * 1e-7)  # near-eps leaf
    params = {"dense": {"kernel": jnp.asarray(W)},
              "tiny": {"kernel": jnp.asarray(t)}}
    tx = make_optimizer(LRo, TOT, warmup_ratio=WRATIO, weight_decay=WDo,
                        clip_grad_norm=None, adam_eps=EPSo)
    state = AccumTrainState.create(params, tx)

    tparams = {"dense.weight": torch.from_numpy(W.copy()),
               "tiny.weight": torch.from_numpy(t.copy())}
    tacc = {n: torch.zeros_like(p) for n, p in tparams.items()}
    tstate = {n: {"step": 0, "m": torch.zeros_like(p),
                  "v": torch.zeros_like(p)} for n, p in tparams.items()}
    warmup = max(int(TOT * WRATIO), 1)

    def mult(k):
        return k / warmup if k < warmup else max(
            0.0, (TOT - k) / (TOT - warmup))

    K, N = 2, 7  # update_freq 2, 7 batches (flush at 6)
    n_updates = 0
    for i in range(N):
        gW = (r.randn(6, 5) * 0.3).astype(np.float32)
        gt = (r.randn(4) * 1e-7).astype(np.float32)  # |g| << eps
        grads = {"dense": {"kernel": jnp.asarray(gW)},
                 "tiny": {"kernel": jnp.asarray(gt)}}
        do_update = should_update(i, N, K)
        state = state.accumulate_or_apply(grads, jnp.asarray(do_update))

        for n, g in (("dense.weight", gW), ("tiny.weight", gt)):
            tacc[n] += torch.from_numpy(g.copy())  # loss.backward sums
        if do_update:
            lr_t = LRo * mult(n_updates)
            for n, p in tparams.items():
                st = tstate[n]
                g = tacc[n]
                st["step"] += 1
                st["m"].mul_(0.9).add_(g, alpha=0.1)
                st["v"].mul_(0.999).addcmul_(g, g, value=0.001)
                denom = st["v"].sqrt().add_(EPSo)
                step_size = lr_t * math.sqrt(
                    1 - 0.999 ** st["step"]) / (1 - 0.9 ** st["step"])
                p.addcdiv_(st["m"], denom, value=-step_size)
                p.add_(p, alpha=-lr_t * WDo)  # both leaves decayed
                tacc[n].zero_()
            n_updates += 1

    assert n_updates == 3  # i = 2, 4, 6
    final = jax.device_get(state.params)
    np.testing.assert_allclose(final["dense"]["kernel"],
                               tparams["dense.weight"].numpy(),
                               rtol=2e-6, atol=2e-7)
    # the near-eps leaf is where SUM vs MEAN accumulation separates:
    # mean semantics would shrink its update ~K-fold (a 2x signal;
    # the tolerance below is fp32 rounding, 4 orders tighter)
    np.testing.assert_allclose(final["tiny"]["kernel"],
                               tparams["tiny.weight"].numpy(),
                               rtol=1e-4, atol=1e-10)
    # accumulator cleared after the final (flush) update
    acc_leaves = jax.tree.leaves(jax.device_get(state.acc))
    assert all(np.all(a == 0) for a in acc_leaves)
