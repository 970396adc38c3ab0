"""Decompose the int8 NAR sampling batch time (VERDICT r3 perf work).

Round-2 claimed the B=64 decode loop is weight-bandwidth-bound; the
arithmetic says otherwise (per B=64 batch: ~4.9 TFLOP encoder matmuls
vs ~0.75 GB of int8 weight reads -> intensity ~6,500 FLOP/byte, far
into compute-bound at the 140 FLOP/byte v5e knee). This drive measures
where the time actually goes by timing ablated variants of the SAME
scan-chained loop:

  full          int8 NAR x4 + 256px SPADE render   (bench baseline)
  no_render     int8 NAR x4 only
  gan_only      SPADE render only (fixed code, loop-carried)
  encoder_only  NAR loop with the cluster head replaced by an argmax
                over the visual hidden state (keeps the loop-carried
                dependence, drops the (2048x10000) head matmul and the
                10k-logit reductions)
  cheap_rank    full head matmul, but rank/commit from a 128-logit
                slice (isolates the 10k-wide max/logsumexp/argmax cost)

Usage:
  python scripts/drive_sample_ablate.py --variants full,no_render,gan_only
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--variants",
                    default="full,no_render,gan_only,encoder_only")
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.models.gan import Generator
    from xlxmert_tpu.models.lxmert import serving_mode
    from xlxmert_tpu.models.xlxmert import XLxmert
    from xlxmert_tpu.serving.lxmert_int8 import (
        apply_calibration, lang_encode,
    )
    from xlxmert_tpu.serving import sampling_int8 as si
    from xlxmert_tpu.utils.boxes import box_position

    print("devices:", jax.devices())
    cfg = LxmertConfig()
    serving_mode(True)
    B, L = ns.batch, 20
    N_STEPS, GRID, N_CODES = ns.steps, 8, 10000
    n_cells = GRID * GRID
    n_heads = cfg.num_attention_heads
    K_SMALL, K_BIG = 1, 5

    model = XLxmert(cfg, dtype=jnp.bfloat16)
    gen = Generator(emb_dim=cfg.visual_feat_dim, base_dim=32,
                    target_size=256, init_H=GRID, init_W=GRID,
                    codebook_dim=256, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)
    centroids = (jax.random.normal(
        rng, (N_CODES, cfg.visual_feat_dim), jnp.float32) * 0.1)

    params = jax.jit(lambda r: model.init(
        r, ids, jnp.zeros((B, n_cells, cfg.visual_feat_dim)),
        jnp.zeros((B, n_cells, 4)), attention_mask=mask,
        centroids=centroids, heads=("obj",))["params"])(rng)
    g_vars = jax.jit(lambda r: gen.init(
        {"params": r, "noise": r},
        jnp.zeros((B, GRID, GRID, cfg.visual_feat_dim)), train=False))(rng)
    g_params, g_sn = g_vars["params"], g_vars.get("sn", {})

    np_params = jax.tree.map(np.asarray, dict(params))
    sp = si.prepare_sampler_params(np_params, cfg, np.asarray(centroids))
    calib = si.calibrate_sampler(sp, centroids, ids[:8], mask[:8], cfg,
                                 grid_size=GRID)
    ssp = apply_calibration(sp, calib)
    box_pos = jnp.asarray(box_position(GRID))

    def nar_loop(sp_, centroids_, input_ids, attention_mask,
                 head_mode: str):
        """make_nar_sampler_int8's loop with a switchable head."""
        Bq = input_ids.shape[0]
        D = centroids_.shape[1]
        centroids_bf16 = centroids_.astype(jnp.bfloat16)
        pos = jnp.broadcast_to(box_pos[None], (Bq, n_cells, 4)).astype(
            jnp.bfloat16)
        code0 = jnp.zeros((Bq, n_cells, D), jnp.bfloat16)
        ids0 = jnp.zeros((Bq, n_cells), jnp.int32)
        prob0 = jnp.zeros((Bq, n_cells), jnp.float32)
        mask_feat = sp_["mask_feat"][None, None, :]
        lang, lang_bias = lang_encode(sp_["bert"], input_ids,
                                      attention_mask, n_heads)

        def step(carry, i):
            code, idsv, prob = carry
            n_mask = ((N_STEPS - i) * n_cells) // N_STEPS
            ranks = jnp.argsort(jnp.argsort(prob, axis=-1), axis=-1)
            vis_mask = (ranks < n_mask).astype(jnp.float32)
            feats = jnp.where(vis_mask[..., None] > 0, mask_feat, code)
            from xlxmert_tpu.serving.lxmert_int8 import (
                cross_encode, visn_encode,
            )

            visn, visn_bias = visn_encode(sp_["bert"], feats, pos, None,
                                          n_heads)
            _, visn, _ = cross_encode(sp_["bert"], lang, visn, lang_bias,
                                      visn_bias, n_heads)
            if head_mode == "encoder_only":
                pred_id = (jnp.argmax(visn, axis=-1) % N_CODES
                           ).astype(jnp.int32)
                pred_prob = visn.max(axis=-1).astype(jnp.float32)
            else:
                logits = si.obj_head_forward(sp_["obj_head"], visn)
                if head_mode == "cheap_rank":
                    pred_id = jnp.argmax(logits[..., :128], axis=-1
                                         ).astype(jnp.int32)
                    pred_prob = logits[..., 0]
                else:
                    logp = (logits.max(axis=-1)
                            - jax.nn.logsumexp(logits, axis=-1))
                    pred_prob = jnp.exp(logp)
                    pred_id = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            pred_code = jnp.take(centroids_bf16, pred_id, axis=0)
            m = vis_mask[..., None] > 0
            code = jnp.where(m, pred_code, code)
            idsv = jnp.where(vis_mask > 0, pred_id, idsv)
            return (code, idsv, pred_prob), None

        (code, idsv, prob), _ = jax.lax.scan(
            step, (code0, ids0, prob0), jnp.arange(N_STEPS))
        return code, idsv, prob

    def make_run(head_mode, render):
        @jax.jit
        def run(ssp_, centroids_, g_params_, g_sn_, ids_, mask_, ks, seed):
            def body(carry, _):
                code, _, _ = nar_loop(ssp_, centroids_ + carry * 1e-6,
                                      ids_, mask_, head_mode)
                if render:
                    img = gen.apply({"params": g_params_, "sn": g_sn_},
                                    code.astype(jnp.bfloat16), train=False)
                    out = img.mean()
                else:
                    out = code.astype(jnp.float32).mean()
                return carry + out.astype(jnp.float32), ()

            c, _ = jax.lax.scan(body, seed, ks)
            return c

        return run

    @jax.jit
    def gan_only(g_params_, g_sn_, centroids_, ks, seed):
        code0 = jnp.take(centroids_.astype(jnp.bfloat16),
                         jnp.arange(B * n_cells) % N_CODES, axis=0
                         ).reshape(B, n_cells, -1)

        def body(carry, _):
            img = gen.apply({"params": g_params_, "sn": g_sn_},
                            code0 + carry.astype(jnp.bfloat16) * 1e-6,
                            train=False)
            return carry + img.mean().astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, seed, ks)
        return c

    def timed(run, args, reps=3):
        def t(k):
            ks = jnp.zeros((k, 1))
            float(run(*args, ks, jnp.float32(0.0)))
            best = float("inf")
            for r in range(reps):
                t0 = time.time()
                float(run(*args, ks, jnp.float32(r)))
                best = min(best, time.time() - t0)
            return best

        per_iter = (t(K_BIG) - t(K_SMALL)) / (K_BIG - K_SMALL)
        return per_iter

    results = {}
    for v in ns.variants.split(","):
        t0 = time.time()
        if v == "gan_only":
            per = timed(gan_only, (g_params, g_sn, centroids))
        elif v == "full":
            per = timed(make_run("full", True),
                        (ssp, centroids, g_params, g_sn, ids, mask))
        elif v == "no_render":
            per = timed(make_run("full", False),
                        (ssp, centroids, g_params, g_sn, ids, mask))
        elif v == "encoder_only":
            per = timed(make_run("encoder_only", False),
                        (ssp, centroids, g_params, g_sn, ids, mask))
        elif v == "cheap_rank":
            per = timed(make_run("cheap_rank", False),
                        (ssp, centroids, g_params, g_sn, ids, mask))
        else:
            raise SystemExit(f"unknown variant {v}")
        results[v] = per
        print(f"{v:14s}: {per*1000:7.2f} ms/batch  "
              f"({B/per:8.1f} samples/s)  [total incl. compile "
              f"{time.time()-t0:.0f}s]", flush=True)

    if "full" in results and "no_render" in results:
        print(f"render cost    : "
              f"{(results['full']-results['no_render'])*1000:7.2f} ms")
    if "no_render" in results and "encoder_only" in results:
        print(f"obj head+rank  : "
              f"{(results['no_render']-results['encoder_only'])*1000:7.2f} ms")
    if "no_render" in results and "cheap_rank" in results:
        print(f"10k reductions : "
              f"{(results['no_render']-results['cheap_rank'])*1000:7.2f} ms")


if __name__ == "__main__":
    main()
