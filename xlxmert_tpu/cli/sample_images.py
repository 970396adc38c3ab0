"""Text-to-image sampling CLI (reference scripts/sample_images.sh +
src/tasks/sample_images.py:27-104 — which as shipped has a SyntaxError;
this implements the unambiguous intent).

python -m xlxmert_tpu.cli.sample_images \
    --load snap/pretrained/x_lxmert/Epoch20_LXRT.pth \
    --centroids data/cluster_centroids/maskrcnn_..._grid8.npy \
    --generator snap/pretrained/G_60.pth \
    --sentences example_sentences.txt --sample_steps 4 --output samples
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--load", required=True, help="X-LXMERT checkpoint "
                   "(.pth or .msgpack)")
    p.add_argument("--centroids", default=None,
                   help="centroid .npy (falls back to vis_emb in the ckpt)")
    p.add_argument("--generator", default=None,
                   help="generator checkpoint (G_60.pth or .msgpack); "
                   "omit to dump code grids without rendering")
    p.add_argument("--vocab", default="data/vocab.txt")
    p.add_argument("--sentences", default="example_sentences.txt")
    p.add_argument("--output", default="samples")
    p.add_argument("--sample_steps", type=int, default=4)
    p.add_argument("--sample_mode", choices=["NAR", "AR"], default="NAR")
    p.add_argument("--save_intermediate", action="store_true",
                   help="NAR only: also render the grid after every "
                   "mask-predict step (imggen_model.py:245-248)")
    p.add_argument("--position_strategy", default="confidence",
                   choices=["confidence", "TLBR", "random"])
    p.add_argument("--int8", action="store_true",
                   help="serve the decode loop (NAR and AR) through the "
                   "static-calibrated int8 engine (serving/"
                   "sampling_int8.py; measured +15%% NAR / +44%% AR "
                   "samples/s on v5e)")
    p.add_argument("--fast_render", action="store_true",
                   help="capped-modulation SPADE render "
                   "(models/gan.render_mode cap=32): -22%% render time; "
                   "mean pixel deviation 2.2e-3, under the 8-bit PNG "
                   "quantum")
    p.add_argument("--grid_size", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_text_length", type=int, default=20)
    p.add_argument("--target_size", type=int, default=256)
    p.add_argument("--g_base_dim", type=int, default=32)
    p.add_argument("--codebook_dim", type=int, default=256)
    p.add_argument("--seed", type=int, default=9595)
    p.add_argument("--model_config", default=None,
                   help="LxmertConfig yaml (defaults to full size)")
    return p.parse_args(argv)


def main(argv=None):
    ns = parse_args(argv)

    import jax
    import jax.numpy as jnp

    if ns.fast_render:
        from xlxmert_tpu.models import gan as gan_mod

        gan_mod.render_mode(32)

    from xlxmert_tpu.core.checkpoint import load_any_checkpoint
    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.data.tokenization import Tokenizer
    from xlxmert_tpu.models.gan import Generator
    from xlxmert_tpu.models.xlxmert import XLxmert
    from xlxmert_tpu.tasks.sampling import make_ar_sampler, make_nar_sampler

    t0 = time.time()
    ckpt = load_any_checkpoint(ns.load)
    if ns.centroids:
        centroids = np.load(ns.centroids)
    elif "vis_emb" in ckpt:
        centroids = np.asarray(ckpt["vis_emb"]["embedding"])
    else:
        raise SystemExit("--centroids required (checkpoint has no vis_emb)")
    centroids = jnp.asarray(centroids)
    n_clusters, feat_dim = centroids.shape

    if ns.model_config:
        cfg = LxmertConfig.from_yaml(ns.model_config).replace(
            num_clusters=n_clusters, visual_feat_dim=feat_dim)
    else:
        cfg = LxmertConfig(num_clusters=n_clusters, visual_feat_dim=feat_dim)
    model = XLxmert(cfg, dtype=jnp.bfloat16)
    params = {k: v for k, v in ckpt.items() if k in
              ("bert", "obj_predict_head", "mask_feat")}
    print(f"loaded checkpoint in {time.time()-t0:.1f}s")

    tokenizer = Tokenizer(ns.vocab)
    sentences = [l.strip() for l in open(ns.sentences) if l.strip()]
    print(f"{len(sentences)} sentences")

    if ns.int8 and ns.save_intermediate:
        raise SystemExit("--int8 does not support --save_intermediate")
    if ns.int8:
        from xlxmert_tpu.serving.lxmert_int8 import apply_calibration
        from xlxmert_tpu.serving.sampling_int8 import (
            calibrate_sampler, make_ar_sampler_int8, make_nar_sampler_int8,
            prepare_sampler_params,
        )

        tok0 = Tokenizer(ns.vocab)
        # calibrate on sentences sampled across the WHOLE stream, not
        # the first batch — first-batch-only scales silently clip later
        # atypical prompts (same fix as cli/serve.py's stream-wide
        # calibration, advisor finding r2)
        idx = np.linspace(0, len(sentences) - 1,
                          num=min(len(sentences), ns.batch_size),
                          dtype=int)
        first = [sentences[i] for i in idx]
        ids0 = tok0.encode_batch(
            first + [""] * (ns.batch_size - len(first)), ns.max_text_length)
        np_params = jax.tree.map(np.asarray, dict(params))
        sp = prepare_sampler_params(np_params, cfg, np.asarray(centroids))
        calib = calibrate_sampler(
            sp, centroids, jnp.asarray(ids0),
            jnp.asarray((ids0 > 0).astype(np.float32)), cfg, ns.grid_size)
        params = apply_calibration(sp, calib)  # sampler tree replaces params
        if ns.sample_mode == "NAR":
            sampler = make_nar_sampler_int8(cfg, ns.sample_steps,
                                            ns.grid_size)
        else:
            strategy = ("order" if ns.position_strategy == "random"
                        else ns.position_strategy)
            sampler = make_ar_sampler_int8(cfg, ns.grid_size, strategy)
        print("int8 serving path calibrated")
    elif ns.sample_mode == "NAR":
        sampler = make_nar_sampler(model, ns.sample_steps, ns.grid_size,
                                   collect_intermediate=ns.save_intermediate)
    else:
        strategy = ("order" if ns.position_strategy == "random"
                    else ns.position_strategy)
        sampler = make_ar_sampler(model, ns.grid_size, strategy)

    renderer = None
    if ns.generator:
        gen = Generator(emb_dim=feat_dim, base_dim=ns.g_base_dim,
                        target_size=ns.target_size, init_H=ns.grid_size,
                        init_W=ns.grid_size, codebook_dim=ns.codebook_dim,
                        dtype=jnp.bfloat16)
        g_ckpt = load_any_checkpoint(ns.generator)
        g_params, g_sn, g_stats = split_generator_ckpt(g_ckpt)
        g_vars = {"params": g_params, "sn": g_sn}
        if g_stats:
            g_vars["batch_stats"] = g_stats

        @jax.jit
        def renderer(code):
            img = gen.apply(g_vars, code, train=False)
            return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    out_dir = Path(ns.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    B = ns.batch_size
    rng = np.random.RandomState(ns.seed)
    for s in range(0, len(sentences), B):
        batch_sents = sentences[s:s + B]
        pad = B - len(batch_sents)
        ids = tokenizer.encode_batch(batch_sents + [""] * pad,
                                     ns.max_text_length)
        mask = (ids > 0).astype(np.float32)
        t0 = time.time()
        if ns.sample_mode == "AR" and ns.position_strategy == "random":
            order = jnp.asarray(rng.permutation(ns.grid_size ** 2))
            code, cluster_ids = sampler(params, centroids, jnp.asarray(ids),
                                        jnp.asarray(mask), order)
        elif ns.sample_mode == "AR":
            code, cluster_ids = sampler(params, centroids, jnp.asarray(ids),
                                        jnp.asarray(mask))
        else:
            code, cluster_ids, _ = sampler(params, centroids,
                                           jnp.asarray(ids),
                                           jnp.asarray(mask))
        steps = None
        if ns.sample_mode == "NAR" and ns.save_intermediate:
            # collect_intermediate: leading (n_steps,) axis; final = last
            steps, code = code, code[-1]
            cluster_ids = cluster_ids[-1]
        dt = time.time() - t0
        print(f"sampled {len(batch_sents)} grids in {dt:.2f}s "
              f"({len(batch_sents)/dt:.1f} samples/s)")
        if renderer is not None:
            imgs = np.asarray(renderer(code).astype(jnp.float32))
            save_pngs(imgs[:len(batch_sents)], batch_sents, out_dir, s)
            if steps is not None:
                for t in range(steps.shape[0]):
                    step_imgs = np.asarray(
                        renderer(steps[t]).astype(jnp.float32))
                    step_dir = out_dir / f"step{t}"
                    step_dir.mkdir(exist_ok=True)
                    save_pngs(step_imgs[:len(batch_sents)], batch_sents,
                              step_dir, s)
        else:
            np.save(out_dir / f"codes_{s:04d}.npy",
                    np.asarray(cluster_ids[:len(batch_sents)]))
    print(f"outputs in {out_dir}")


def split_generator_ckpt(ckpt):
    """Return (params, sn, batch_stats) from either a native generator
    checkpoint (trainer save format: top-level variable collections) or a
    converted torch tree (SN u/v inline as weight_u/weight_v)."""
    if "params" in ckpt and set(ckpt) <= {"params", "sn", "batch_stats"}:
        return (ckpt.get("params", {}), ckpt.get("sn", {}),
                ckpt.get("batch_stats", {}))
    from xlxmert_tpu.core.convert import split_variables

    cols = split_variables(ckpt)
    return (cols.get("params", {}), cols.get("sn", {}),
            cols.get("batch_stats", {}))


def save_pngs(imgs, sentences, out_dir: Path, offset: int):
    from PIL import Image

    for i, (img, sent) in enumerate(zip(imgs, sentences)):
        arr = (img * 255).astype(np.uint8)
        name = "".join(c if c.isalnum() or c == " " else "" for c in sent)
        name = "_".join(name.split())[:60] or f"sample_{offset + i}"
        Image.fromarray(arr).save(out_dir / f"{offset + i:04d}_{name}.png")


if __name__ == "__main__":
    main()
