"""Finetune engine + evaluator + QA-surgery tests (8-device CPU mesh)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlxmert_tpu.core.config import FinetuneConfig, LxmertConfig
from xlxmert_tpu.data.answer_table import AnswerTable, surgery_answer_head
from xlxmert_tpu.data.evaluators import (
    GQAEvaluator, NLVR2Evaluator, VQAEvaluator,
)
from xlxmert_tpu.tasks.finetune import FinetuneEngine

TINY = LxmertConfig(
    vocab_size=120, hidden_size=32, num_attention_heads=4,
    intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
    visual_feat_dim=16, num_qa_labels=9)


def make_engine(task="vqa", num_answers=9):
    cfg = FinetuneConfig(task=task, batch_size=16, grid_size=4,
                         max_text_length=10, mixed_precision=False, lr=2e-3)
    return FinetuneEngine(cfg, num_answers, model_cfg=TINY, total_steps=50)


def make_batch(cfg, task, B=16, seed=0):
    rng = np.random.RandomState(seed)
    L, V = cfg.max_text_length, cfg.n_grids
    batch = {
        "word_ids": rng.randint(1, 120, (B, L)).astype(np.int32),
    }
    if task == "nlvr2":
        batch["vis_feats"] = rng.randn(B, 2, V, 16).astype(np.float32)
        batch["boxes"] = rng.rand(B, 2, V, 4).astype(np.float32)
        batch["labels"] = rng.randint(0, 2, (B,)).astype(np.int32)
    else:
        batch["vis_feats"] = rng.randn(B, V, 16).astype(np.float32)
        batch["boxes"] = rng.rand(B, V, 4).astype(np.float32)
        soft = rng.rand(B, 9).astype(np.float32)
        batch["targets"] = soft / soft.sum(1, keepdims=True)
    return batch


@pytest.mark.parametrize("task,num_answers", [("vqa", 9), ("nlvr2", 2)])
def test_finetune_learns(task, num_answers):
    eng = make_engine(task, num_answers)
    state = eng.create_state(jax.random.PRNGKey(0))
    batch = eng.place(make_batch(eng.cfg, task))
    step = eng.train_step()
    losses = []
    for _ in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_predict_and_evaluators():
    eng = make_engine("vqa", 9)
    state = eng.create_state(jax.random.PRNGKey(0))
    label2ans = [f"ans{i}" for i in range(9)]
    batch = make_batch(eng.cfg, "vqa")
    batch["question_ids"] = [f"q{i}" for i in range(16)]
    quesid2ans = eng.predict(state.params, [batch], label2ans)
    assert len(quesid2ans) == 16
    assert all(a in label2ans for a in quesid2ans.values())

    id2datum = {f"q{i}": {"label": {quesid2ans[f"q{i}"]: 0.5}} for i in range(16)}
    ev = VQAEvaluator(id2datum)
    assert abs(ev.evaluate(quesid2ans) - 0.5) < 1e-9
    assert abs(ev.oracle_score(quesid2ans) - 0.5) < 1e-9


def test_dump_formats(tmp_path):
    ev = VQAEvaluator({1: {"label": {"cat": 1.0}}})
    p = tmp_path / "vqa.json"
    ev.dump_result({1: "cat"}, str(p))
    data = json.loads(p.read_text())
    assert data == [{"question_id": 1, "answer": "cat"}]

    gev = GQAEvaluator({"5": {"label": {"dog": 1.0}}})
    p = tmp_path / "gqa.json"
    gev.dump_result({"5": "dog"}, str(p))
    assert json.loads(p.read_text()) == [{"questionId": "5", "prediction": "dog"}]

    nev = NLVR2Evaluator({"u1": {"label": 1, "identifier": "test-123"}})
    p = tmp_path / "nlvr2.csv"
    nev.dump_result({"u1": 1}, str(p))
    assert p.read_text() == "test-123,True\n"
    assert nev.evaluate({"u1": 1}) == 1.0
    assert nev.evaluate({"u1": 0}) == 0.0


def test_qa_surgery():
    all_ans = [{"ans": "cat", "dsets": ["vqa"]},
               {"ans": "dog", "dsets": ["vqa"]},
               {"ans": "gray", "dsets": ["vqa"]}]
    table = AnswerTable(all_ans)
    rng = np.random.RandomState(0)
    pre = {"answer_head": {"logit_fc_3": {
        "kernel": rng.randn(8, 3).astype(np.float32),
        "bias": rng.randn(3).astype(np.float32)}}}
    fin = {"answer_head": {"logit_fc_3": {
        "kernel": np.ones((8, 4), np.float32),
        "bias": np.ones((4,), np.float32)}}}
    # label2ans includes a normalizable answer ("grey"->"gray") and a miss
    merged, (loaded, unload) = surgery_answer_head(
        pre, fin, table, ["dog", "grey", "pizza", "the cat"])
    assert (loaded, unload) == (3, 1)
    k = merged["answer_head"]["logit_fc_3"]["kernel"]
    b = merged["answer_head"]["logit_fc_3"]["bias"]
    np.testing.assert_array_equal(k[:, 0], pre["answer_head"]["logit_fc_3"]["kernel"][:, 1])
    np.testing.assert_array_equal(k[:, 1], pre["answer_head"]["logit_fc_3"]["kernel"][:, 2])
    assert (k[:, 2] == 0).all() and b[2] == 0  # "pizza" not in table
    np.testing.assert_array_equal(k[:, 3], pre["answer_head"]["logit_fc_3"]["kernel"][:, 0])


@pytest.mark.parametrize("task,num_answers", [("vqa", 9), ("nlvr2", 2)])
def test_predict_int8_agrees(task, num_answers):
    """--serve_int8 path: int8 prediction agrees with the fp32 path on
    most examples and emits the same answer format."""
    eng = make_engine(task, num_answers)
    state = eng.create_state(jax.random.PRNGKey(0))
    label2ans = None if task == "nlvr2" else [f"ans{i}" for i in range(9)]

    def batches():
        for s in range(2):
            b = make_batch(eng.cfg, task, seed=s)
            b["question_ids"] = [f"q{s}_{i}" for i in range(16)]
            yield b

    ref = eng.predict(state.params, batches(), label2ans)
    got = eng.predict(state.params, batches(), label2ans, int8=True)
    assert set(got) == set(ref) and len(got) == 32
    agree = np.mean([got[k] == ref[k] for k in ref])
    assert agree >= 0.8, agree
