"""BERT-pretrained initialization parity (VERDICT r2 item #1).

The reference's default pretraining init is
`XLxmertForPretraining.from_pretrained('bert-base-uncased')`
(reference lxmert_pretrain.py:58-61): BERT weights land on the language
stack, embeddings, pooler, and LM/matched heads by torch name overlap;
`--fromScratch` opts out (param.py:90-93). Oracle: converted BERT weights
must reproduce HF BertModel's outputs on text-only input at fp32.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlxmert_tpu.core.checkpoint import merge_params
from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.core.convert import load_bert_state_dict
from xlxmert_tpu.models.lxmert import (
    Embeddings, Pooler, PreTrainingHeads, TransformerLayer,
    extend_attention_mask,
)
from xlxmert_tpu.models.xlxmert import XLxmert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

L_LAYERS = 2

SMALL = dict(vocab_size=111, hidden_size=48, num_attention_heads=4,
             intermediate_size=96, l_layers=L_LAYERS, x_layers=1, r_layers=1,
             visual_feat_dim=24, visual_pos_dim=4, num_qa_labels=17,
             num_clusters=50, max_position_embeddings=64)


@pytest.fixture(scope="module")
def bert_pair():
    """(torch BertForPreTraining with MORE layers than our language stack,
    converted overlay tree) — extra layers must be dropped like the
    reference's strict=False load drops BERT layers 9-11."""
    torch.manual_seed(0)
    tcfg = transformers.BertConfig(
        vocab_size=SMALL["vocab_size"], hidden_size=SMALL["hidden_size"],
        num_hidden_layers=L_LAYERS + 2,
        num_attention_heads=SMALL["num_attention_heads"],
        intermediate_size=SMALL["intermediate_size"],
        max_position_embeddings=SMALL["max_position_embeddings"],
        type_vocab_size=2)
    tmodel = transformers.BertForPreTraining(tcfg).eval()
    tree = load_bert_state_dict(tmodel.state_dict(), l_layers=L_LAYERS)
    return tmodel, tree


def _text_inputs(B=3, L=9, seed=3):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, SMALL["vocab_size"], size=(B, L)).astype(np.int64)
    ids[:, 0] = 1
    mask = np.ones((B, L), np.float32)
    mask[0, L - 3:] = 0.0
    return ids, mask


def test_language_stack_matches_hf_bert(bert_pair):
    tmodel, tree = bert_pair
    ids, mask = _text_inputs()
    cfg = LxmertConfig(**SMALL)

    # torch oracle: embeddings + the first L_LAYERS encoder layers + pooler
    bert = tmodel.bert
    ids_t, mask_t = torch.from_numpy(ids), torch.from_numpy(mask)
    with torch.no_grad():
        ext = bert.get_extended_attention_mask(mask_t, ids_t.shape)
        h_t = bert.embeddings(ids_t)
        for layer in bert.encoder.layer[:L_LAYERS]:
            h_t = layer(h_t, ext)[0]
        pooled_t = bert.pooler(h_t)
        lm_t, nsp_t = tmodel.cls(h_t, pooled_t)

    bias = extend_attention_mask(jnp.asarray(mask), jnp.float32)
    h = Embeddings(cfg).apply({"params": tree["bert"]["embeddings"]},
                              jnp.asarray(ids))
    for i in range(L_LAYERS):
        h = TransformerLayer(cfg).apply(
            {"params": tree["bert"]["encoder"][f"layer_{i}"]}, h, bias)
    np.testing.assert_allclose(np.asarray(h), h_t.numpy(),
                               atol=2e-5, rtol=1e-4)

    pooled = Pooler(cfg).apply({"params": tree["bert"]["pooler"]}, h)
    np.testing.assert_allclose(np.asarray(pooled), pooled_t.numpy(),
                               atol=2e-5, rtol=1e-4)

    # LM head (tied decoder) + NSP -> matched head
    word_emb = tree["bert"]["embeddings"]["word_embeddings"]["embedding"]
    lm, matched = PreTrainingHeads(cfg).apply(
        {"params": tree["cls"]}, h, pooled, jnp.asarray(word_emb))
    np.testing.assert_allclose(np.asarray(lm), lm_t.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(matched), nsp_t.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_overlay_into_xlxmert_params(bert_pair):
    """The tree overlays onto a real XLxmert param pytree with zero
    unexpected paths; only BERT-covered paths change."""
    tmodel, tree = bert_pair
    cfg = LxmertConfig(**SMALL)
    model = XLxmert(cfg, task_qa=True)
    B, L, V = 2, 6, 4
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, L), jnp.int32),
        jnp.zeros((B, V, SMALL["visual_feat_dim"])),
        jnp.zeros((B, V, 4)),
        centroids=jnp.zeros((SMALL["num_clusters"],
                             SMALL["visual_feat_dim"])),
        word_embedding_matrix=jnp.zeros((SMALL["vocab_size"],
                                         SMALL["hidden_size"])),
        heads=("lm", "matched", "obj", "qa"))["params"]

    merged, missing, unexpected = merge_params(
        jax.tree.map(np.asarray, params), tree)
    assert unexpected == []
    # BERT layers beyond the language stack were dropped
    assert f"layer_{L_LAYERS}" not in tree["bert"]["encoder"]
    # loaded: embeddings identical to the torch table
    np.testing.assert_array_equal(
        merged["bert"]["embeddings"]["word_embeddings"]["embedding"],
        tmodel.bert.embeddings.word_embeddings.weight.detach().numpy())
    # untouched: visual stacks and task heads keep their random init
    np.testing.assert_array_equal(
        merged["bert"]["encoder"]["r_layers_0"]["attention"]["self"]
              ["query"]["kernel"],
        params["bert"]["encoder"]["r_layers_0"]["attention"]["self"]
              ["query"]["kernel"])
    assert any("obj_predict_head" in p for p in missing)


def test_bare_bertmodel_state_dict(bert_pair):
    """A BertModel-only state_dict (no `bert.` prefix) maps identically."""
    tmodel, tree = bert_pair
    bare = load_bert_state_dict(tmodel.bert.state_dict(), l_layers=L_LAYERS)
    np.testing.assert_array_equal(
        bare["bert"]["encoder"]["layer_0"]["attention"]["self"]["query"]
            ["kernel"],
        tree["bert"]["encoder"]["layer_0"]["attention"]["self"]["query"]
            ["kernel"])
    assert "cls" not in bare  # no heads in a bare BertModel


def test_oldstyle_gamma_beta_layernorm_keys(bert_pair):
    """The canonical 2019-era bert-base-uncased pytorch_model.bin names
    LayerNorm params `gamma`/`beta` (modern transformers exports use
    `weight`/`bias`); both vintages must convert identically."""
    tmodel, tree = bert_pair
    sd = tmodel.state_dict()
    old = {}
    for k, v in sd.items():
        if "LayerNorm" in k and k.endswith(".weight"):
            k = k[:-7] + ".gamma"
        elif "LayerNorm" in k and k.endswith(".bias"):
            k = k[:-5] + ".beta"
        old[k] = v
    assert any(k.endswith(".gamma") for k in old)  # vintage layout made
    got = load_bert_state_dict(old, l_layers=L_LAYERS)
    ln = got["bert"]["encoder"]["layer_0"]["attention"]["output"]
    ref = tree["bert"]["encoder"]["layer_0"]["attention"]["output"]
    np.testing.assert_array_equal(ln["LayerNorm"]["scale"],
                                  ref["LayerNorm"]["scale"])
    np.testing.assert_array_equal(ln["LayerNorm"]["bias"],
                                  ref["LayerNorm"]["bias"])
    np.testing.assert_array_equal(
        got["bert"]["embeddings"]["LayerNorm"]["scale"],
        tree["bert"]["embeddings"]["LayerNorm"]["scale"])
