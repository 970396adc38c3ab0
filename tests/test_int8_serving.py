"""Int8 serving engine vs the fp32 flax model: quantization error must be
small (cosine similarity) and answer decisions must agree."""
import numpy as np

import jax
import jax.numpy as jnp

from xlxmert_tpu.core.config import LxmertConfig
from xlxmert_tpu.models.lxmert import LxmertModel, VisualAnswerHead
from xlxmert_tpu.ops.quant import int8_dense, quantize_weight
from xlxmert_tpu.serving.lxmert_int8 import (
    lxmert_forward, make_vqa_serving_fn, prepare_answer_head, prepare_params,
)
from xlxmert_tpu.utils.boxes import box_position

CFG = LxmertConfig(
    vocab_size=200, hidden_size=64, num_attention_heads=4,
    intermediate_size=128, l_layers=2, x_layers=2, r_layers=2,
    visual_feat_dim=32, num_clusters=0)


def cos(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)


def test_int8_dense_accuracy():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 48).astype(np.float32))
    w = rng.randn(48, 32).astype(np.float32) * 0.1
    b = rng.randn(32).astype(np.float32) * 0.1
    qw = quantize_weight(w, b)
    got = np.asarray(int8_dense(x, qw), np.float32)
    ref = np.asarray(x) @ w + b
    assert cos(got, ref) > 0.999


def test_serving_forward_matches_flax():
    model = LxmertModel(CFG, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    B, L, V = 4, 12, 16
    ids = jnp.asarray(rng.randint(1, 200, (B, L)).astype(np.int32))
    mask = np.ones((B, L), np.float32)
    mask[2, 8:] = 0
    mask = jnp.asarray(mask)
    feats = jnp.asarray(rng.randn(B, V, 32).astype(np.float32) * 0.5)
    pos = jnp.asarray(np.broadcast_to(box_position(4)[None], (B, V, 4)).copy())
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos,
                        attention_mask=mask)["params"]

    lang_ref, visn_ref, pooled_ref = model.apply(
        {"params": params}, ids, feats, pos, attention_mask=mask,
        deterministic=True)

    qp = prepare_params(params, CFG)
    lang, visn, pooled = lxmert_forward(
        qp, ids, feats, pos, attention_mask=mask,
        n_heads=CFG.num_attention_heads)

    assert cos(lang, lang_ref) > 0.99
    assert cos(visn, visn_ref) > 0.99
    assert cos(pooled, pooled_ref) > 0.99


def test_vqa_answers_agree():
    model = LxmertModel(CFG, dtype=jnp.float32)
    head = VisualAnswerHead(CFG, num_labels=29, dtype=jnp.float32)
    rng = np.random.RandomState(2)
    B, L, V = 16, 12, 16
    ids = jnp.asarray(rng.randint(1, 200, (B, L)).astype(np.int32))
    mask = jnp.asarray(np.ones((B, L), np.float32))
    feats = jnp.asarray(rng.randn(B, V, 32).astype(np.float32) * 0.5)
    pos = jnp.asarray(np.broadcast_to(box_position(4)[None], (B, V, 4)).copy())
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos,
                        attention_mask=mask)["params"]
    hp = head.init(jax.random.PRNGKey(1), jnp.zeros((B, CFG.hidden_size))
                   )["params"]

    _, _, pooled = model.apply({"params": params}, ids, feats, pos,
                               attention_mask=mask, deterministic=True)
    ref_logits = head.apply({"params": hp}, pooled)

    fn = make_vqa_serving_fn(CFG)
    logits = fn(prepare_params(params, CFG), prepare_answer_head(hp),
                ids, feats, pos, mask)
    assert logits.shape == ref_logits.shape
    assert cos(logits, ref_logits) > 0.98
    agree = (np.argmax(np.asarray(logits), -1)
             == np.argmax(np.asarray(ref_logits), -1)).mean()
    assert agree >= 0.9, agree


def test_static_calibrated_mode_matches_flax():
    """Calibrated static activation scales (no dynamic row-max): accuracy
    must hold vs fp32, and the jitted static path must equal the eager
    static path (scales are constants, not data-dependent)."""
    from xlxmert_tpu.serving.lxmert_int8 import apply_calibration, calibrate

    model = LxmertModel(CFG, dtype=jnp.float32)
    head = VisualAnswerHead(CFG, num_labels=29, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    B, L, V = 16, 12, 16

    def batch(seed):
        r = np.random.RandomState(seed)
        ids = jnp.asarray(r.randint(1, 200, (B, L)).astype(np.int32))
        mask = jnp.asarray(np.ones((B, L), np.float32))
        feats = jnp.asarray(r.randn(B, V, 32).astype(np.float32) * 0.5)
        pos = jnp.asarray(np.broadcast_to(box_position(4)[None],
                                          (B, V, 4)).copy())
        return ids, feats, pos, mask

    ids, feats, pos, mask = batch(10)
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos,
                        attention_mask=mask)["params"]
    hp = head.init(jax.random.PRNGKey(1), jnp.zeros((B, CFG.hidden_size))
                   )["params"]
    qp = prepare_params(params, CFG)
    hqp = prepare_answer_head(hp)

    calib = calibrate(qp, hqp, [batch(s) for s in (10, 20, 21)], CFG)
    assert len(calib) > 10  # every dense site observed
    sqp = apply_calibration(qp, calib)
    shqp = apply_calibration(hqp, calib)

    # EVERY QuantWeight must now carry a static scale — calibration keys
    # must match the real arrays (guards the tracer-id bug where
    # apply_calibration silently matched nothing and the "static" path
    # was actually dynamic)
    def quant_weights(tree):
        from xlxmert_tpu.ops.quant import QuantWeight

        found = []

        def walk(n):
            if isinstance(n, QuantWeight):
                found.append(n)
            elif isinstance(n, dict):
                [walk(v) for v in n.values()]
            elif isinstance(n, (list, tuple)):
                [walk(v) for v in n]

        walk(tree)
        return found

    sqws = quant_weights(sqp) + quant_weights(shqp)
    assert sqws and all(q.inv_a is not None for q in sqws), \
        "calibration did not attach static scales to every site"

    _, _, pooled = model.apply({"params": params}, ids, feats, pos,
                               attention_mask=mask, deterministic=True)
    ref_logits = np.asarray(head.apply({"params": hp}, pooled))

    fn = make_vqa_serving_fn(CFG)
    logits = np.asarray(fn(sqp, shqp, ids, feats, pos, mask))
    assert cos(logits, ref_logits) > 0.98
    # per-tensor static scales are coarser than per-row dynamic ones;
    # with random weights the logits are near-flat, so judge agreement
    # margin-aware: disagreements are only allowed where fp32's top-2
    # margin is small (a genuine near-tie), and confident answers agree.
    pred, ref_pred = np.argmax(logits, -1), np.argmax(ref_logits, -1)
    top2 = np.sort(ref_logits, axis=-1)[:, -2:]
    margin = top2[:, 1] - top2[:, 0]
    disagree = pred != ref_pred
    assert disagree.mean() <= 0.2, disagree.mean()
    assert margin[disagree].max(initial=0.0) < np.median(margin), \
        (margin, disagree)

    # held-out batch (not in calibration) also fine
    ids2, feats2, pos2, mask2 = batch(99)
    _, _, pooled2 = model.apply({"params": params}, ids2, feats2, pos2,
                                attention_mask=mask2, deterministic=True)
    ref2 = np.asarray(head.apply({"params": hp}, pooled2))
    got2 = np.asarray(fn(sqp, shqp, ids2, feats2, pos2, mask2))
    assert cos(got2, ref2) > 0.98


def test_int8_attention_einsums_match_bf16_attention():
    """Lever (b), VERDICT r3 #3: int8 score/context attention einsums
    with calibrated static q/k/v scales. Same calibration pass as the
    dense sites; accuracy vs the bf16-attention int8 path and vs fp32
    must hold, and enabling without calibration must fail loudly."""
    import pytest

    from xlxmert_tpu.serving import lxmert_int8 as engine

    model = LxmertModel(CFG, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    B, L, V = 16, 12, 16

    def batch(seed):
        r = np.random.RandomState(seed)
        ids = jnp.asarray(r.randint(1, 200, (B, L)).astype(np.int32))
        mask = np.ones((B, L), np.float32)
        mask[1, 9:] = 0
        return (ids, jnp.asarray(r.randn(B, V, 32).astype(np.float32) * .5),
                jnp.asarray(np.broadcast_to(box_position(4)[None],
                                            (B, V, 4)).copy()),
                jnp.asarray(mask))

    ids, feats, pos, mask = batch(10)
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos,
                        attention_mask=mask)["params"]
    head = VisualAnswerHead(CFG, num_labels=29, dtype=jnp.float32)
    hp = head.init(jax.random.PRNGKey(1), jnp.zeros((B, CFG.hidden_size))
                   )["params"]
    qp = prepare_params(params, CFG)
    hqp = prepare_answer_head(hp)
    calib = engine.calibrate(qp, hqp, [batch(s) for s in (10, 20)], CFG)
    sqp = engine.apply_calibration(qp, calib)
    shqp = engine.apply_calibration(hqp, calib)

    # every attention site got its q/k/v scales from the same pass
    def act_scales(tree):
        from xlxmert_tpu.ops.quant import ActScale

        found = []

        def walk(n):
            if isinstance(n, ActScale):
                found.append(n)
            elif isinstance(n, dict):
                [walk(v) for v in n.values()]
            elif isinstance(n, (list, tuple)) and not isinstance(n, ActScale):
                [walk(v) for v in n]

        walk(tree)
        return found

    scs = act_scales(sqp)
    n_att = CFG.l_layers + CFG.r_layers + 3 * CFG.x_layers  # self+cross
    assert len(scs) == 3 * n_att
    assert all(s.calibrated for s in scs), "attention scales uncalibrated"

    fn = make_vqa_serving_fn(CFG)
    base = np.asarray(fn(sqp, shqp, ids, feats, pos, mask))

    engine.int8_attention(True)
    try:
        fn8 = make_vqa_serving_fn(CFG)  # fresh jit: toggle is trace-time
        got = np.asarray(fn8(sqp, shqp, ids, feats, pos, mask))
        # uncalibrated tree -> loud failure, not silent bf16 fallback
        with pytest.raises(RuntimeError, match="calibrated"):
            make_vqa_serving_fn(CFG)(qp, shqp, ids, feats, pos, mask)
    finally:
        engine.int8_attention(False)

    _, _, pooled = model.apply({"params": params}, ids, feats, pos,
                               attention_mask=mask, deterministic=True)
    ref = np.asarray(head.apply({"params": hp}, pooled))
    assert cos(got, base) > 0.99, cos(got, base)
    assert cos(got, ref) > 0.97, cos(got, ref)
    agree = (np.argmax(got, -1) == np.argmax(base, -1)).mean()
    assert agree >= 0.8, agree


def test_int8_serving_under_data_parallel_mesh():
    """Production multi-chip serving: the int8 forward jitted over a
    data mesh (batch sharded, quantized params replicated) must equal
    the single-device result — GSPMD partitions the engine with no code
    changes."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from xlxmert_tpu.serving.lxmert_int8 import (
        answer_head_forward, apply_calibration, calibrate,
    )
    from xlxmert_tpu.parallel.mesh import make_mesh

    model = LxmertModel(CFG, dtype=jnp.float32)
    head = VisualAnswerHead(CFG, num_labels=29, dtype=jnp.float32)
    B, L, V = 16, 12, 16
    r = np.random.RandomState(11)
    ids = jnp.asarray(r.randint(1, 200, (B, L)).astype(np.int32))
    mask = jnp.asarray(np.ones((B, L), np.float32))
    feats = jnp.asarray(r.randn(B, V, 32).astype(np.float32) * 0.5)
    pos = jnp.asarray(np.broadcast_to(box_position(4)[None],
                                      (B, V, 4)).copy())
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos,
                        attention_mask=mask)["params"]
    hp = head.init(jax.random.PRNGKey(1), jnp.zeros((B, CFG.hidden_size))
                   )["params"]
    qp = prepare_params(params, CFG)
    hqp = prepare_answer_head(hp)
    calib = calibrate(qp, hqp, [(ids, feats, pos, mask)], CFG)
    sqp = apply_calibration(qp, calib)
    shqp = apply_calibration(hqp, calib)

    def fwd(sqp, shqp, ids, feats, pos, mask):
        _, _, pooled = lxmert_forward(sqp, ids, feats, pos,
                                      attention_mask=mask,
                                      n_heads=CFG.num_attention_heads)
        return answer_head_forward(shqp, pooled)

    ref = jax.jit(fwd)(sqp, shqp, ids, feats, pos, mask)

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))
    sqp_r = jax.device_put(sqp, repl)
    shqp_r = jax.device_put(shqp, repl)
    args = [jax.device_put(x, batched) for x in (ids, feats, pos, mask)]
    out = jax.jit(fwd)(sqp_r, shqp_r, *args)
    assert out.sharding.is_equivalent_to(batched, out.ndim)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-3)


def test_nlvr2_int8_forward_matches_flax():
    """Int8 NLVR2 (2-image flatten + sentence repeat + 2*hidden head)
    pins to the fp32 NLVR2Model."""
    from xlxmert_tpu.models.task_heads import NLVR2Model
    from xlxmert_tpu.serving.lxmert_int8 import (
        apply_calibration, calibrate_forward, nlvr2_forward,
    )

    model = NLVR2Model(CFG, num_answers=2, dtype=jnp.float32)
    B, L, V = 6, 10, 16
    r = np.random.RandomState(4)
    ids = jnp.asarray(r.randint(1, 200, (B, L)).astype(np.int32))
    mask = jnp.asarray(np.ones((B, L), np.float32))
    feats = jnp.asarray(r.randn(B, 2, V, 32).astype(np.float32) * 0.5)
    pos = jnp.asarray(np.broadcast_to(box_position(4)[None, None],
                                      (B, 2, V, 4)).copy())
    variables = model.init(jax.random.PRNGKey(0), ids, feats, pos,
                           attention_mask=mask)
    params = variables["params"]
    ref = model.apply(variables, ids, feats, pos, attention_mask=mask)

    qp = prepare_params(params["bert"], CFG)
    hqp = prepare_answer_head(params["logit_fc"])

    def fwd(qp_, hqp_, ids, feats, pos, mask):
        nlvr2_forward(qp_, hqp_, ids, feats, pos, attention_mask=mask,
                      n_heads=CFG.num_attention_heads)

    calib = calibrate_forward(fwd, (qp, hqp),
                              [(ids, feats, pos, mask)])
    sqp = apply_calibration(qp, calib)
    shqp = apply_calibration(hqp, calib)
    got = jax.jit(
        lambda a, b, i, f, p, m: nlvr2_forward(
            a, b, i, f, p, attention_mask=m,
            n_heads=CFG.num_attention_heads))(sqp, shqp, ids, feats, pos,
                                              mask)
    a = np.asarray(ref, np.float32).ravel()
    b = np.asarray(got, np.float32).ravel()
    c = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert c > 0.98, c
    # answers agree on most examples (2-way argmax)
    agree = (np.asarray(ref).argmax(-1) == np.asarray(got).argmax(-1)).mean()
    assert agree >= 0.8, agree


def test_feature_cache_sharded_lookup():
    """FeatureCache: table sharded over the data axis, lookup inside a
    jitted sharded program == host gather; serving forward from cached
    features == forward from streamed features."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from xlxmert_tpu.parallel.mesh import make_mesh
    from xlxmert_tpu.serving.feature_cache import FeatureCache

    class FakeReader:
        def __init__(self, n, g=4, d=32):
            r = np.random.RandomState(7)
            self.data = {f"img_{i}": r.randn(g, g, d).astype(np.float32)
                         for i in range(n)}

        def get(self, img_id):
            return self.data[img_id]

    n_imgs = 13  # deliberately not divisible by 8 -> pad rows
    reader = FakeReader(n_imgs)
    ids = list(reader.data.keys())
    mesh = make_mesh()
    cache = FeatureCache.build(reader, ids, dtype=jnp.float32, mesh=mesh)
    assert cache.table.shape[0] == 16  # padded to the mesh size
    assert not cache.table.sharding.is_fully_replicated

    B = 16
    picks = [ids[i] for i in np.random.RandomState(3).randint(0, n_imgs, B)]
    idx = cache.indices(picks)
    batched = NamedSharding(mesh, P("data"))
    idx_dev = jax.device_put(jnp.asarray(idx), batched)

    got = jax.jit(FeatureCache.lookup)(cache.table, idx_dev)
    want = np.stack([reader.get(p).reshape(16, -1) for p in picks])
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=1e-6)

    # end to end: int8 forward from the cache == forward from the stream
    from xlxmert_tpu.serving.lxmert_int8 import (
        answer_head_forward, apply_calibration, calibrate,
    )

    model = LxmertModel(CFG, dtype=jnp.float32)
    head = VisualAnswerHead(CFG, num_labels=29, dtype=jnp.float32)
    L = 12
    r = np.random.RandomState(5)
    tok = jnp.asarray(r.randint(1, 200, (B, L)).astype(np.int32))
    mask = jnp.asarray(np.ones((B, L), np.float32))
    pos = jnp.asarray(np.broadcast_to(box_position(4)[None],
                                      (B, 16, 4)).copy())
    feats = jnp.asarray(want)
    params = model.init(jax.random.PRNGKey(0), tok, feats, pos,
                        attention_mask=mask)["params"]
    hp = head.init(jax.random.PRNGKey(1),
                   jnp.zeros((B, CFG.hidden_size)))["params"]
    qp = prepare_params(params, CFG)
    hqp = prepare_answer_head(hp)
    calib = calibrate(qp, hqp, [(tok, feats, pos, mask)], CFG)
    sqp = apply_calibration(qp, calib)
    shqp = apply_calibration(hqp, calib)

    def from_cache(sqp, shqp, table, tok, idx, pos, mask):
        f = FeatureCache.lookup(table, idx)
        _, _, pooled = lxmert_forward(sqp, tok, f, pos,
                                      attention_mask=mask,
                                      n_heads=CFG.num_attention_heads)
        return answer_head_forward(shqp, pooled)

    def from_stream(sqp, shqp, tok, f, pos, mask):
        _, _, pooled = lxmert_forward(sqp, tok, f, pos,
                                      attention_mask=mask,
                                      n_heads=CFG.num_attention_heads)
        return answer_head_forward(shqp, pooled)

    got = jax.jit(from_cache)(sqp, shqp, cache.table, tok, idx_dev, pos,
                              mask)
    ref = jax.jit(from_stream)(sqp, shqp, tok, feats, pos, mask)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=1e-4)
