"""Golden-value parity: our flax LXMERT vs the torch implementation the
reference delegates to (HF modeling_lxmert; see SURVEY.md §2.2).

The reference has no tests (SURVEY.md §4); logit-level parity against the
torch module graph is the strongest oracle available without the released
checkpoints. Weights are randomly initialized in torch, converted with
core/convert.py, and outputs compared at fp32.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.core.convert import convert_torch_state_dict
from xlxmert_tpu.models.lxmert import (
    LxmertModel, PreTrainingHeads, VisualAnswerHead, VisualObjHead,
)
from xlxmert_tpu.utils.boxes import box_position

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from transformers.models.lxmert import modeling_lxmert as hf  # noqa: E402


SMALL = dict(
    vocab_size=111, hidden_size=48, num_attention_heads=4,
    intermediate_size=96, l_layers=2, x_layers=2, r_layers=2,
    visual_feat_dim=24, visual_pos_dim=4, num_qa_labels=17,
    num_clusters=50,
)


def make_pair(cfg_kw, seed=0):
    """Build (torch model, our config, converted params)."""
    torch.manual_seed(seed)
    hf_cfg = transformers.LxmertConfig(
        vocab_size=cfg_kw["vocab_size"], hidden_size=cfg_kw["hidden_size"],
        num_attention_heads=cfg_kw["num_attention_heads"],
        intermediate_size=cfg_kw["intermediate_size"],
        l_layers=cfg_kw["l_layers"], x_layers=cfg_kw["x_layers"],
        r_layers=cfg_kw["r_layers"], visual_feat_dim=cfg_kw["visual_feat_dim"],
        visual_pos_dim=cfg_kw["visual_pos_dim"],
        num_qa_labels=cfg_kw["num_qa_labels"],
    )
    tmodel = hf.LxmertModel(hf_cfg).eval()
    cfg = LxmertConfig(**cfg_kw)
    params = convert_torch_state_dict(tmodel.state_dict())
    return tmodel, hf_cfg, cfg, params


def make_inputs(cfg_kw, B=3, L=7, V=9, seed=1):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, cfg_kw["vocab_size"], size=(B, L)).astype(np.int64)
    ids[:, 0] = 1
    mask = np.ones((B, L), np.float32)
    mask[0, L - 2:] = 0.0  # padding on one row
    feats = rng.randn(B, V, cfg_kw["visual_feat_dim"]).astype(np.float32)
    pos = rng.rand(B, V, cfg_kw["visual_pos_dim"]).astype(np.float32)
    return ids, mask, feats, pos


@pytest.mark.parametrize("cfg_kw", [SMALL], ids=["small"])
def test_backbone_parity(cfg_kw):
    tmodel, _, cfg, params = make_pair(cfg_kw)
    ids, mask, feats, pos = make_inputs(cfg_kw)

    with torch.no_grad():
        tout = tmodel(
            input_ids=torch.from_numpy(ids),
            visual_feats=torch.from_numpy(feats),
            visual_pos=torch.from_numpy(pos),
            attention_mask=torch.from_numpy(mask),
            return_dict=True,
        )

    model = LxmertModel(cfg, dtype=jnp.float32)
    lang, visn, pooled = model.apply(
        {"params": params},
        jnp.asarray(ids), jnp.asarray(feats), jnp.asarray(pos),
        attention_mask=jnp.asarray(mask), deterministic=True)

    np.testing.assert_allclose(np.asarray(lang), tout.language_output.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(visn), tout.vision_output.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), tout.pooled_output.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_full_size_backbone_parity():
    """Production shape: 9/5/5 stacks, hidden 768 — the checkpoint-parity
    critical path (pretrain.bash:19)."""
    cfg_kw = dict(vocab_size=30522, hidden_size=768, num_attention_heads=12,
                  intermediate_size=3072, l_layers=9, x_layers=5, r_layers=5,
                  visual_feat_dim=2048, visual_pos_dim=4, num_qa_labels=9500,
                  num_clusters=10000)
    tmodel, _, cfg, params = make_pair(cfg_kw)
    B, L, V = 2, 20, 64
    rng = np.random.RandomState(7)
    ids = rng.randint(1, 30522, size=(B, L)).astype(np.int64)
    mask = np.ones((B, L), np.float32)
    mask[1, 15:] = 0.0
    feats = rng.randn(B, V, 2048).astype(np.float32) * 0.1
    pos = np.broadcast_to(box_position(8)[None], (B, V, 4)).copy()

    with torch.no_grad():
        tout = tmodel(input_ids=torch.from_numpy(ids),
                      visual_feats=torch.from_numpy(feats),
                      visual_pos=torch.from_numpy(pos),
                      attention_mask=torch.from_numpy(mask), return_dict=True)

    model = LxmertModel(cfg, dtype=jnp.float32)
    lang, visn, pooled = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(feats),
        jnp.asarray(pos), attention_mask=jnp.asarray(mask), deterministic=True)

    np.testing.assert_allclose(np.asarray(lang), tout.language_output.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(visn), tout.vision_output.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pooled), tout.pooled_output.numpy(),
                               atol=1e-4, rtol=1e-3)


def test_pretraining_heads_parity():
    cfg_kw = SMALL
    tmodel, hf_cfg, cfg, params = make_pair(cfg_kw)
    torch.manual_seed(3)
    theads = hf.LxmertPreTrainingHeads(
        hf_cfg, tmodel.embeddings.word_embeddings.weight).eval()
    head_params = convert_torch_state_dict(theads.state_dict())

    B, L = 2, 5
    rng = np.random.RandomState(2)
    seq = rng.randn(B, L, cfg_kw["hidden_size"]).astype(np.float32)
    pooled = rng.randn(B, cfg_kw["hidden_size"]).astype(np.float32)

    with torch.no_grad():
        t_lm, t_matched = theads(torch.from_numpy(seq), torch.from_numpy(pooled))

    emb = params["embeddings"]["word_embeddings"]["embedding"]
    lm, matched = PreTrainingHeads(cfg, dtype=jnp.float32).apply(
        {"params": head_params}, jnp.asarray(seq), jnp.asarray(pooled),
        jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(lm), t_lm.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(matched), t_matched.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_visual_obj_head_parity():
    """Our VisualObjHead vs the reference's custom cluster head
    (x-lxmert/src/lxrt/modeling.py:8-53) with centroid-tied out_cluster."""
    cfg_kw = SMALL
    cfg = LxmertConfig(**cfg_kw)
    hf_cfg = transformers.LxmertConfig(
        hidden_size=cfg.hidden_size, visual_feat_dim=cfg.visual_feat_dim)
    hf_cfg.num_clusters = cfg.num_clusters
    hf_cfg.visual_obj_loss = True
    hf_cfg.visual_attr_loss = False

    # Reference head re-built in torch (can't import the reference module —
    # we only mirror its math: transform -> linear_feat -> out_cluster).
    torch.manual_seed(5)
    import torch.nn as tnn

    class RefObjHead(tnn.Module):
        def __init__(self):
            super().__init__()
            self.transform = hf.LxmertPredictionHeadTransform(hf_cfg)
            self.linear_feat = tnn.Linear(cfg.hidden_size, cfg.visual_feat_dim)
            self.out_cluster = tnn.Linear(cfg.visual_feat_dim, cfg.num_clusters)

        def forward(self, h):
            h = self.transform(h)
            feat = self.linear_feat(h)
            return feat, self.out_cluster(feat)

    thead = RefObjHead().eval()
    centroids = np.random.RandomState(6).randn(
        cfg.num_clusters, cfg.visual_feat_dim).astype(np.float32)
    with torch.no_grad():  # tie out_cluster weight to centroids (modeling.py:151)
        thead.out_cluster.weight.copy_(torch.from_numpy(centroids))

    head_params = convert_torch_state_dict(
        {f"obj_predict_head.{k}": v for k, v in thead.state_dict().items()}
    )["obj_predict_head"]

    B, V = 2, 9
    hidden = np.random.RandomState(8).randn(B, V, cfg.hidden_size).astype(np.float32)
    with torch.no_grad():
        t_feat, t_logit = thead(torch.from_numpy(hidden))

    out = VisualObjHead(cfg, dtype=jnp.float32).apply(
        {"params": head_params}, jnp.asarray(hidden), jnp.asarray(centroids),
        out_keys=("obj", "feat"))
    np.testing.assert_allclose(np.asarray(out["feat"]), t_feat.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["obj"]), t_logit.numpy(),
                               atol=2e-4, rtol=1e-4)


def test_visual_answer_head_parity():
    cfg_kw = SMALL
    cfg = LxmertConfig(**cfg_kw)
    hf_cfg = transformers.LxmertConfig(hidden_size=cfg.hidden_size)
    torch.manual_seed(9)
    thead = hf.LxmertVisualAnswerHead(hf_cfg, cfg.num_qa_labels).eval()
    head_params = convert_torch_state_dict(thead.state_dict())

    pooled = np.random.RandomState(10).randn(4, cfg.hidden_size).astype(np.float32)
    with torch.no_grad():
        t_out = thead(torch.from_numpy(pooled))
    out = VisualAnswerHead(cfg, cfg.num_qa_labels, dtype=jnp.float32).apply(
        {"params": head_params}, jnp.asarray(pooled))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=2e-5, rtol=1e-4)


def test_box_position_matches_reference_semantics():
    b = box_position(8)
    assert b.shape == (64, 4)
    assert b.min() == 0.0 and b.max() == 1.0
    # cell (row 2, col 3)
    np.testing.assert_allclose(b[2 * 8 + 3], [3 / 8, 2 / 8, 4 / 8, 3 / 8])


def test_exact_math_defaults_at_import():
    """The module-level perf toggles default to the EXACT reference math
    (erf gelu, fp32 softmax, XLA attention) — serving_mode() is opt-in.
    The autouse toggle-reset fixture in conftest.py restores these
    between tests, which also means a drifted *default* would be masked
    for every test but the first; this test binds the defaults
    themselves (found by scripts/mutation_check.py round 5)."""
    from xlxmert_tpu.models import lxmert as m

    with open(m.__file__) as f:
        src = f.read()
    # source-level pin: a re-import with a flipped default is exactly a
    # one-line edit of these assignments
    assert "\nFAST_GELU = False\n" in src
    assert "\nFAST_SOFTMAX = False\n" in src
    assert '\nATTENTION_IMPL = "xla"\n' in src
