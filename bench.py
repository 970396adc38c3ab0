"""Headline benchmark. Prints ONE JSON line with both BASELINE.json
throughput targets plus roofline context:

  {"metric": "vqa_queries_per_sec_per_chip", "value": ..., "unit": ...,
   "vs_baseline": ...,
   "extra": {"serving_path", "model_tflops", "mfu_vs_int8_peak",
             "sampling_samples_per_sec", "sampling_vs_baseline",
             "bf16_queries_per_sec", "bucketed_mix_qps" (+ assumed-mix
             envelope: floor/ceiling/per-bucket), "ar_samples_per_sec",
             "gan_imgs_per_sec", "kmeans_rows_per_sec",
             "extract_imgs_per_sec", "pretrain_examples_per_sec"}}

Every headline README/BASELINE row is driver-captured here (VERDICT r4
#5): serving (int8/bf16/bucketed), NAR sampling, AR decode, pretrain
step, GAN (D,G) pairs, and the offline factory (k-means + extraction).

Config #1 (primary): batched VQA inference from pre-extracted 8x8 grid
features — served through the static-calibrated int8 engine
(serving/lxmert_int8.py; measured 9959 q/s vs 8522 bf16 on this chip).
Config #2: text-to-image sampling (NAR mask-predict 4 steps + 256px
SPADE render, scripts/sample_images.sh semantics).

Measurement method: the axon tunnel makes `block_until_ready`
unreliable (dispatch returns early), so each config chains K dependent
iterations inside one jitted `lax.scan` with a data-dependent carry,
fetches one scalar, and differences two K values to cancel the constant
tunnel/dispatch overhead.

Baselines: the reference publishes no numbers (BASELINE.md). Anchors are
estimates of the reference PyTorch stack on A100 (eager fp16):
  - VQA: ~19.4 GFLOP/sample at 15-25% of 312 TFLOP/s => 3-5k q/s;
    we use 4000. North star: vs_baseline >= 5.
  - sampling: ~90 GFLOP/sample (4 full forwards + obj head + GAN render)
    with a 4-step host-driven loop => ~100-200 samples/s; we use 150.
MFU context is derived from an analytic FLOP count (flops_per_sample)
against the v5e int8 peak (394 TOP/s) so progress is also judged
against silicon, not only the estimated anchor.
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

A100_BASELINE_QPS = 4000.0
A100_BASELINE_SAMPLES_PER_SEC = 150.0
V5E_INT8_PEAK_TOPS = 394e12
# Best sustained int8 matmul rate actually measured on this chip:
# 377 TOP/s flop-weighted over the serving GEMM mix, via the standalone
# loop-carried pair-chain program (scripts/roofline_int8.py, round 4 —
# 96% of the 394 datasheet peak; the earlier in-engine microbench said
# 287). Efficiency against THIS number is the one that can move with
# better scheduling; mfu_vs_int8_peak is the against-silicon context.
MEASURED_INT8_TOPS = 377e12


def flops_per_sample(cfg, L=20, V=64, n_answers=3129):
    """Analytic matmul FLOPs of one VQA forward (2*M*K*N per dense)."""
    H, I = cfg.hidden_size, cfg.intermediate_size

    def dense(m, k, n):
        return 2 * m * k * n

    def self_att(T):
        qkv = 3 * dense(T, H, H)
        core = 2 * dense(T, T, H)  # scores + context
        return qkv + core + dense(T, H, H)

    def ffn(T):
        return dense(T, H, I) + dense(T, I, H)

    total = dense(V, cfg.visual_feat_dim, H) + dense(V, 4, H)
    total += cfg.l_layers * (self_att(L) + ffn(L))
    total += cfg.r_layers * (self_att(V) + ffn(V))
    for _ in range(cfg.x_layers):
        # shared cross-attn both directions: q+kv+out per side + cores
        total += 2 * dense(L, H, H) + 2 * dense(V, H, H)  # kv each side
        total += dense(L, H, H) + dense(V, H, H)          # queries
        total += 2 * (2 * dense(L, V, H))                  # cores both dirs
        total += dense(L, H, H) + dense(V, H, H)          # out projs
        total += self_att(L) + self_att(V) + ffn(L) + ffn(V)
    total += dense(1, H, H)                                # pooler
    total += dense(1, H, 2 * H) + dense(1, 2 * H, n_answers)  # answer head
    return total


def measure_vqa(cfg, Bs=(256, 512), verbose=False):
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.models.lxmert import (LxmertModel, VisualAnswerHead,
                                           serving_mode)
    from xlxmert_tpu.serving import lxmert_int8 as engine
    from xlxmert_tpu.utils.boxes import box_position

    serving_mode(True)
    # Batch is self-tuned: B=256 vs 512 flip rank across runs through
    # the tunnel (256: 9.6-9.8k, 512: 9.0-10.5k q/s measured), so both
    # are timed and the best per-run wins. The rest of the sweep loses:
    # 640: 7.7k, 768: 8.0k, 1024: 7.8k q/s (measured round 2).
    # The whole-block fused Pallas path measured slower at every block
    # size (ops/fused_block.py docstring) and is not a candidate.
    L, V = 20, 64
    K_SMALL, K_BIG = 4, 36

    model = LxmertModel(cfg, dtype=jnp.bfloat16)
    head = VisualAnswerHead(cfg, num_labels=3129, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    def inputs(B):
        ids = jnp.ones((B, L), jnp.int32)
        mask = jnp.ones((B, L), jnp.float32)
        feats = jax.random.normal(rng, (B, V, cfg.visual_feat_dim),
                                  jnp.bfloat16) * 0.1
        pos = jnp.broadcast_to(jnp.asarray(box_position(8))[None],
                               (B, V, 4)).astype(jnp.bfloat16)
        return ids, mask, feats, pos

    ids, mask, feats, pos = inputs(256)
    # init on the host CPU backend: quantization needs the params as
    # numpy, and fetching ~800 MB from the device through the axon
    # tunnel costs ~10+ min; the int8/bf16 trees upload (4x/2x smaller)
    # on first use instead
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.jit(lambda r: model.init(
            r, ids[:8], feats[:8], pos[:8],
            attention_mask=mask[:8])["params"])(rng)
        head_params = head.init(rng,
                                jnp.zeros((8, cfg.hidden_size)))["params"]

    # int8 static path: quantize + one-batch jitted calibration
    qp = engine.prepare_params(jax.tree.map(np.asarray, params), cfg)
    hqp = engine.prepare_answer_head(
        jax.tree.map(np.asarray, head_params))
    Bc = 8
    calib = engine.calibrate(
        qp, hqp,
        [(ids[:Bc], feats[:Bc].astype(jnp.float32), pos[:Bc], mask[:Bc])],
        cfg)
    sqp = engine.apply_calibration(qp, calib)
    shqp = engine.apply_calibration(hqp, calib)

    # NB: all arrays are explicit jit arguments — closure-captured device
    # arrays are embedded into the HLO, and the axon tunnel's
    # /remote_compile POST rejects >~100MB bodies (HTTP 413).
    @jax.jit
    def run_int8(sqp, shqp, ids, pos, mask, stacked, seed):
        def body(carry, f):
            _, _, pooled = engine.lxmert_forward(
                sqp, ids, f + carry * 1e-6, pos, attention_mask=mask,
                n_heads=cfg.num_attention_heads)
            logits = engine.answer_head_forward(shqp, pooled)
            return carry + logits.mean().astype(jnp.bfloat16), ()

        c, _ = jax.lax.scan(body, seed, stacked)
        return c

    # pin the bf16 trees to the TPU: params are CPU-committed after the
    # host-side init, and committed arrays re-transfer on EVERY jit
    # call. Cast to bf16 on the host first (halves the one-time upload).
    dev = jax.devices()[0]

    def to_dev_bf16(tree):
        return jax.device_put(
            jax.tree.map(
                lambda x: np.asarray(x).astype(np.dtype(jnp.bfloat16)),
                tree), dev)

    bf16_params = to_dev_bf16(params)
    bf16_head = to_dev_bf16(head_params)

    @jax.jit
    def run_bf16(params, head_params, ids, pos, mask, stacked, seed):
        def body(carry, f):
            _, _, pooled = model.apply(
                {"params": params}, ids, f + carry * 1e-6, pos,
                attention_mask=mask, deterministic=True)
            logits = head.apply({"params": head_params}, pooled)
            return carry + logits.mean().astype(jnp.bfloat16), ()

        c, _ = jax.lax.scan(body, seed, stacked)
        return c

    make_stack = jax.jit(
        lambda k, B: jax.random.normal(
            jax.random.PRNGKey(1), (k, B, V, cfg.visual_feat_dim),
            jnp.bfloat16) * 0.1,
        static_argnums=(0, 1))

    def timed(run, args, B, reps=3):
        def t(k):
            stacked = make_stack(k, B)
            float(run(*args, stacked, jnp.bfloat16(0.0)))  # compile+warm
            best = float("inf")
            for r in range(reps):
                t0 = time.time()
                float(run(*args, stacked, jnp.bfloat16(r)))
                best = min(best, time.time() - t0)
            return best

        per_batch = (t(K_BIG) - t(K_SMALL)) / (K_BIG - K_SMALL)
        return B / per_batch

    qps_int8, qps_bf16, qi_b256 = 0.0, 0.0, 0.0
    for B in Bs:
        ids, mask, _, pos = inputs(B)
        qi = timed(run_int8, (sqp, shqp, ids, pos, mask), B)
        qb = timed(run_bf16, (bf16_params, bf16_head, ids, pos, mask), B)
        if verbose:
            print(f"B={B}: int8 {qi:8.1f} q/s, bf16 {qb:8.1f} q/s",
                  flush=True)
        if B == 256:
            qi_b256 = qi
        qps_int8 = max(qps_int8, qi)
        qps_bf16 = max(qps_bf16, qb)

    # length-bucketed stream (CEILING.md §1 lever 3, measured +10.7%):
    # per-bucket rates at B=256 and the typical-VQA-mix effective rate
    # cli/serve --buckets routes into. L=20 reuses the headline run
    # when the sweep included B=256; otherwise it is measured here.
    from xlxmert_tpu.serving.lxmert_int8 import VQA_LENGTH_MIX
    bucket = {20: qi_b256} if qi_b256 > 0 else {}
    B = 256
    _, _, _, pos = inputs(B)
    for Lb in sorted(VQA_LENGTH_MIX):
        if Lb in bucket:
            continue
        ids_b = jnp.ones((B, Lb), jnp.int32)
        mask_b = jnp.ones((B, Lb), jnp.float32)
        bucket[Lb] = timed(run_int8, (sqp, shqp, ids_b, pos, mask_b), B)
    bucketed = 1.0 / sum(f / bucket[Lb]
                         for Lb, f in VQA_LENGTH_MIX.items())

    path = "int8_static"
    qps = qps_int8
    if qps_bf16 > qps_int8:  # safety: never report a regression path
        qps, path = qps_bf16, "bf16"
    return qps, qps_bf16, path, bucketed, bucket


def measure_sampling(cfg):
    """NAR mask-predict (4 steps, 8x8 grid, 10k codes) + 256px SPADE
    render, matching scripts/sample_images.sh. Serves through the int8
    sampler (serving/sampling_int8.py, measured 1000 vs 872 samples/s
    bf16 on v5e) with the bf16 path as the safety fallback."""
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.models.gan import Generator
    from xlxmert_tpu.models.xlxmert import XLxmert
    from xlxmert_tpu.serving.lxmert_int8 import apply_calibration
    from xlxmert_tpu.serving.sampling_int8 import (
        calibrate_sampler, make_nar_sampler_int8, prepare_sampler_params,
    )
    from xlxmert_tpu.tasks.sampling import make_nar_sampler

    B, L = 64, 20
    N_STEPS, GRID, N_CODES = 4, 8, 10000
    # VQA-grade rigor (VERDICT r2 "what's weak" #1): wider K spread and
    # reps=3 so a single slow tunnel round-trip can't sink the number.
    K_SMALL, K_BIG = 2, 10

    model = XLxmert(cfg, dtype=jnp.bfloat16)
    gen = Generator(emb_dim=cfg.visual_feat_dim, base_dim=32,
                    target_size=256, init_H=GRID, init_W=GRID,
                    codebook_dim=256, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)
    centroids_np = (np.random.RandomState(0)
                    .randn(N_CODES, cfg.visual_feat_dim)
                    .astype(np.float32) * 0.1)
    centroids = jnp.asarray(centroids_np)

    # host-CPU init (see measure_vqa: avoids the slow device->host fetch
    # for quantization), then explicit device placement for the bf16
    # path so nothing re-transfers per call
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.jit(lambda r: model.init(
            r, jnp.ones((8, L), jnp.int32),
            jnp.zeros((8, GRID * GRID, cfg.visual_feat_dim)),
            jnp.zeros((8, GRID * GRID, 4)),
            attention_mask=jnp.ones((8, L), jnp.float32),
            centroids=jnp.asarray(centroids_np),
            heads=("obj",))["params"])(rng)
        g_vars = jax.jit(lambda r: gen.init(
            {"params": r, "noise": r},
            jnp.zeros((8, GRID, GRID, cfg.visual_feat_dim)),
            train=False))(rng)

    sampler = make_nar_sampler(model, N_STEPS, GRID)

    import numpy as _np
    np_params = jax.tree.map(_np.asarray, dict(params))
    sp = prepare_sampler_params(np_params, cfg, _np.asarray(centroids))
    dev = jax.devices()[0]

    def to_dev_bf16(tree):
        return jax.device_put(
            jax.tree.map(
                lambda x: _np.asarray(x).astype(_np.dtype(jnp.bfloat16))
                if _np.asarray(x).dtype in (_np.float32, _np.float64)
                else _np.asarray(x), tree), dev)

    params = to_dev_bf16(dict(params))
    g_params = to_dev_bf16(g_vars["params"])
    g_sn = jax.device_put(jax.tree.map(_np.asarray, g_vars.get("sn", {})),
                          dev)
    calib = calibrate_sampler(sp, centroids, ids[:8], mask[:8], cfg,
                              grid_size=GRID)
    ssp = apply_calibration(sp, calib)
    sampler_i8 = make_nar_sampler_int8(cfg, N_STEPS, GRID)

    @jax.jit
    def run(params, centroids, g_params, g_sn, ids, mask, ks, seed):
        def body(carry, _):
            code, _, _ = sampler(params, centroids + carry * 1e-6, ids,
                                 mask)
            img = gen.apply({"params": g_params, "sn": g_sn}, code,
                            train=False)
            return carry + img.mean().astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, seed, ks)
        return c

    @jax.jit
    def run_i8(ssp, centroids, g_params, g_sn, ids, mask, ks, seed):
        def body(carry, _):
            code, _, _ = sampler_i8(ssp, centroids + carry * 1e-6, ids,
                                    mask)
            img = gen.apply({"params": g_params, "sn": g_sn},
                            code.astype(jnp.bfloat16), train=False)
            return carry + img.mean().astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, seed, ks)
        return c

    def timed(fn, args):
        def t(k, reps=3):
            ks = jnp.zeros((k, 1))
            float(fn(*args, ks, jnp.float32(0.0)))
            best = float("inf")
            for r in range(reps):
                t0 = time.time()
                float(fn(*args, ks, jnp.float32(r)))
                best = min(best, time.time() - t0)
            return best

        per_iter = (t(K_BIG) - t(K_SMALL)) / (K_BIG - K_SMALL)
        return B / per_iter

    sps_i8 = timed(run_i8, (ssp, centroids, g_params, g_sn, ids, mask))
    sps_bf16 = timed(run, (params, centroids, g_params, g_sn, ids, mask))

    # AR decode rate (confidence strategy, full head — the reference
    # default, imggen_model.py:49-167), decode only, int8 engine. Reuses
    # this function's calibrated ssp; CEILING.md §2b headline (~175/s).
    from xlxmert_tpu.serving.sampling_int8 import make_ar_sampler_int8

    ar_fn = make_ar_sampler_int8(cfg, grid_size=GRID,
                                 strategy="confidence")
    ar_raw = getattr(ar_fn, "__wrapped__", ar_fn)

    @jax.jit
    def run_ar(ssp, centroids, ids, mask, ks, seed):
        def body(carry, _):
            out = ar_raw(ssp, centroids + carry * 1e-6, ids, mask)
            cl = out[1]
            return carry + cl.mean().astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, seed, ks)
        return c

    def timed_ar():
        def t(k, reps=3):
            ks = jnp.zeros((k, 1))
            float(run_ar(ssp, centroids, ids, mask, ks, jnp.float32(0)))
            best = float("inf")
            for r in range(reps):
                t0 = time.time()
                float(run_ar(ssp, centroids, ids, mask, ks,
                             jnp.float32(r)))
                best = min(best, time.time() - t0)
            return best

        per_iter = (t(5) - t(1)) / 4
        return B / per_iter

    try:
        ar_sps = timed_ar()
    except Exception as e:
        ar_sps = {"error": _err_str(e)}

    # fast-render variant (models/gan.render_mode cap=32): SPADE
    # modulation computed at 32x32 and upsampled — measured mean pixel
    # deviation 2.15e-3, under the 8-bit PNG quantum (7.9e-3); -22%
    # render time (scripts/drive_render_opt.py). Reported separately;
    # the headline sampling number stays the exact-render path.
    from xlxmert_tpu.models import gan as gan_mod

    gan_mod.render_mode(32)
    try:
        run_i8_fast = jax.jit(run_i8.__wrapped__)
        sps_fast = timed(run_i8_fast,
                         (ssp, centroids, g_params, g_sn, ids, mask))
    finally:
        gan_mod.render_mode(None)

    path = "int8_static"
    sps = sps_i8
    if sps_bf16 > sps_i8:  # safety: never report a regression path
        sps, path = sps_bf16, "bf16"
    return sps, sps_bf16, path, sps_fast, ar_sps


def measure_gan():
    """Full (D,G) training pairs at 256px, B=32 — the GAN trainer
    headline (README: 156 imgs/s/chip). K pairs chained in one jit
    (GanEngine.chained_gd_step, equality-pinned vs sequential in
    tests/test_gan_trainer.py); matches train_generator.bash semantics
    (hinge + ACGAN + perceptual + featmatch)."""
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.core.config import GanConfig
    from xlxmert_tpu.tasks.train_generator import GanEngine

    GRID, EMB, B, K = 8, 2048, 32, 4
    r = np.random.RandomState(0)
    n_classes = 10000
    centroids = jnp.asarray((r.randn(n_classes, EMB) * 0.2)
                            .astype(np.float32))
    ids = r.randint(0, n_classes, (B, GRID * GRID)).astype(np.int32)
    codes = np.asarray(centroids)[ids].reshape(B, GRID, GRID, EMB)
    images = (r.rand(B, 256, 256, 3).astype(np.float32) * 2.0 - 1.0)

    cfg = GanConfig(emb_dim=EMB, init_H=GRID, init_W=GRID,
                    target_size=256, n_classes=n_classes, batch_size=B,
                    mixed_precision=True)
    eng = GanEngine(cfg)
    state = eng.create_state(jax.random.PRNGKey(0), centroids)
    batch = eng.place({"image": images, "code": codes, "cluster_id": ids})
    key = jax.random.PRNGKey(1)
    fn = eng.chained_gd_step(K)
    state, dl, gl = fn(state, batch, centroids, key)  # compile + warm
    float(np.asarray(dl))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        state, dl, gl = fn(state, batch, centroids, key)
        float(np.asarray(dl))
        best = min(best, time.time() - t0)
    return B / (best / K)


def measure_factory():
    """Offline-factory rates (CEILING.md §3b): one k-means Lloyd
    iteration at production K=10k/D=2048 (rows/s — assignment matmul
    dominates, rate extrapolates linearly to the 2.56M-row build) and
    X-152-FPN grid extraction at the reference canvas (800x1344, bf16
    B=8 — the measured-best config; the reference loops batch=1 through
    a CUDA detector, coco_extract_grid_feature.py:236-260)."""
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.models.detectron import (DetectronConfig,
                                              DetectronGridExtractor)
    from xlxmert_tpu.vocab.kmeans import lloyd_step_chunked

    out = {}
    N, Kc, D, chunk = 131072, 10000, 2048, 65536
    x = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    w = jnp.ones((N,), jnp.float32)
    cents = x[:Kc] + 0.0
    cents, inertia = lloyd_step_chunked(x, w, cents, Kc, chunk)
    float(np.asarray(inertia))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        cents, inertia = lloyd_step_chunked(x, w, cents, Kc, chunk)
        float(np.asarray(inertia))
        best = min(best, time.time() - t0)
    out["kmeans_rows_per_sec"] = round(N / best, 0)

    B, H, W, K = 8, 800, 1344, 4
    # per-stage hybrid grouped-conv lowering: einsum at stage 1 (Cg=8)
    # only — measured +10% over all-grouped (23.3 vs 21.1 img/s, r5;
    # all-einsum loses at 16.6 — scripts/drive_group_conv.py)
    from xlxmert_tpu.models.detectron import group_conv_mode
    group_conv_mode("auto")
    model = DetectronGridExtractor(DetectronConfig(), grid_size=8,
                                   dtype=jnp.bfloat16)
    images = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                               jnp.float32) * 50.0
    sizes = jnp.tile(jnp.asarray([[800, 1333]], jnp.int32), (B, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images,
                                 sizes)["params"]

    @jax.jit
    def chain(params, images, sizes):
        def body(imgs, _):
            feats = model.apply({"params": params}, imgs, sizes)
            return imgs + feats.mean().astype(imgs.dtype) * 1e-4, \
                feats.mean()

        _, means = jax.lax.scan(body, images, None, length=K)
        return means

    m = chain(params, images, sizes)
    float(np.asarray(m)[-1])  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        m = chain(params, images, sizes)
        float(np.asarray(m)[-1])
        best = min(best, time.time() - t0)
    out["extract_imgs_per_sec"] = round(K * B / best, 1)
    group_conv_mode(False)
    return out


def measure_pretrain(cfg):
    """One chained full pretrain step (vis_mask task, B=256, rbg PRNG —
    the production default) via PretrainEngine.chained_train_step.
    Returns ex/s/chip (measured 1,375-1,561 across the three tasks on
    v5e; scripts/drive_pretrain.py has the full ablation)."""
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    import jax.numpy as jnp

    from xlxmert_tpu.core.config import TrainConfig
    from xlxmert_tpu.tasks.pretrain import PretrainEngine

    tcfg = TrainConfig(batch_size=256)
    eng = PretrainEngine(tcfg, model_cfg=cfg, total_steps=1000)
    state = eng.create_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    r = np.random.RandomState(2)
    B, L, V = tcfg.batch_size, tcfg.max_text_length, tcfg.n_grids
    centroids = jnp.asarray(
        r.randn(cfg.num_clusters, cfg.visual_feat_dim)
        .astype(np.float32) * 0.05)
    batch = eng.place({
        "word_id": np.concatenate(
            [np.full((B, 1), 101, np.int32),
             r.randint(1, cfg.vocab_size, (B, L - 1)).astype(np.int32)],
            axis=1),
        "other_word_id": r.randint(1, cfg.vocab_size,
                                   (B, L)).astype(np.int32),
        "matched_label": r.randint(0, 2, (B,)).astype(np.int32),
        "cluster_id": r.randint(0, cfg.num_clusters,
                                (B, V)).astype(np.int32),
    })
    K = 8
    fn = eng.chained_train_step("vis_mask", K)
    state, loss = fn(state, batch, rng, centroids)  # compile + warm
    float(np.asarray(loss))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        state, loss = fn(state, batch, rng, centroids)
        float(np.asarray(loss))
        best = min(best, time.time() - t0)
    return B / (best / K)


def _err_str(e):
    return f"{type(e).__name__}: {e}"[:500]


def main():
    """Never dies without the ONE JSON line: every stage (and even
    package import / backend init) is fenced so the driver records WHY
    instead of an rc=1 with no parse (the BENCH_r03 failure mode —
    'Unable to initialize backend axon' killed the whole run)."""
    extra = {}
    errors = {}
    qps = 0.0

    try:
        from xlxmert_tpu.core.config import LxmertConfig

        cfg = LxmertConfig()
    except Exception as e:  # import/backend catastrophes
        print(json.dumps({
            "metric": "vqa_queries_per_sec_per_chip", "value": 0.0,
            "unit": "queries/sec", "vs_baseline": 0.0,
            "extra": {"errors": {"import": _err_str(e)}},
        }))
        return

    try:
        qps, qps_bf16, path, bucketed, bucket = measure_vqa(cfg)
        fps = flops_per_sample(cfg)
        extra.update({
            "serving_path": path,
            "bucketed_mix_qps": round(bucketed, 1),
            # Mix-sensitivity envelope (VERDICT r4 #6): the 35/45/15/5
            # length mix is ASSUMED (serving/lxmert_int8.VQA_LENGTH_MIX,
            # basis in docs/CEILING.md §1 lever 3); the envelope is what
            # the stream rate would be at the measured extremes.
            "bucketed_mix_assumed": True,
            "bucketed_mix_floor_qps": round(bucket.get(20, 0.0), 1),
            "bucketed_mix_ceiling_qps": round(
                bucket.get(8, 0.0), 1),
            "bucket_qps": {str(Lb): round(v, 1)
                           for Lb, v in sorted(bucket.items())},
            "bf16_queries_per_sec": round(qps_bf16, 1),
            "model_tflops": round(qps * fps / 1e12, 1),
            "mfu_vs_int8_peak": round(qps * fps / V5E_INT8_PEAK_TOPS, 3),
            "efficiency_vs_measured_roofline": round(
                qps * fps / MEASURED_INT8_TOPS, 3),
        })
    except Exception as e:
        errors["vqa"] = _err_str(e)

    try:
        (samples_per_sec, sps_bf16, s_path, sps_fast,
         ar_sps) = measure_sampling(cfg)
        extra.update({
            "sampling_samples_per_sec": round(samples_per_sec, 1),
            "sampling_path": s_path,
            "sampling_bf16_samples_per_sec": round(sps_bf16, 1),
            "sampling_fast_render_samples_per_sec": round(sps_fast, 1),
            "sampling_vs_baseline": round(
                samples_per_sec / A100_BASELINE_SAMPLES_PER_SEC, 3),
        })
        if isinstance(ar_sps, dict):
            errors["ar"] = ar_sps["error"]
        else:
            extra["ar_samples_per_sec"] = round(ar_sps, 1)
    except Exception as e:
        errors["sampling"] = _err_str(e)

    try:
        extra["pretrain_examples_per_sec"] = round(measure_pretrain(cfg), 1)
    except Exception as e:
        errors["pretrain"] = _err_str(e)

    try:
        extra["gan_imgs_per_sec"] = round(measure_gan(), 1)
    except Exception as e:
        errors["gan"] = _err_str(e)

    try:
        extra.update(measure_factory())
    except Exception as e:
        errors["factory"] = _err_str(e)

    if errors:
        extra["errors"] = errors
    print(json.dumps({
        "metric": "vqa_queries_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / A100_BASELINE_QPS, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
