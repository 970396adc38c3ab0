"""Batch VQA serving CLI — the production deployment shape.

The reference's only serving surface is the finetune Trainer's predict
dump (/root/reference/x-lxmert/src/tasks/vqa.py:259-295, one DataLoader
pass streaming fp32 features per query). This CLI packages the measured
TPU-native design from docs/SERVING.md instead:

  - the image-feature catalog is loaded ONCE into device HBM as bf16
    (serving/feature_cache.py) — a query ships only token ids + an
    image index (~100 B vs 512 KB);
  - the forward runs through the static-calibrated int8 engine
    (serving/lxmert_int8.py; --bf16 falls back to the flax path);
  - answers stream to a jsonl, with throughput printed at the end.

Usage:
  python -m xlxmert_tpu.cli.serve \\
      --load snap/vqa/BEST.msgpack --model_config model.yaml \\
      --h5 data/mscoco_imgfeat/maskrcnn_valid_grid8.h5 \\
      --vocab vocab.txt --label2ans trainval_label2ans.json \\
      --questions questions.jsonl --output answers.jsonl [--batch 256]

questions.jsonl lines: {"question_id": ..., "img_id": ..., "sent": ...}
(the reference's dataset json fields, vqa_data.py:40-56). GQA
checkpoints serve identically (same model shape) — point --label2ans
at the GQA answer list.
"""
from __future__ import annotations

import argparse
import json
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load", required=True, help="finetuned checkpoint "
                   "(.msgpack or .pth; params must hold bert+answer_head)")
    p.add_argument("--model_config", default=None, help="LxmertConfig yaml")
    p.add_argument("--h5", required=True, help="grid-feature h5")
    p.add_argument("--vocab", required=True)
    p.add_argument("--label2ans", required=True,
                   help="label -> answer json list")
    p.add_argument("--questions", required=True, help="jsonl of "
                   "{question_id, img_id, sent}")
    p.add_argument("--output", required=True, help="answers jsonl")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--max_text_length", type=int, default=20)
    p.add_argument("--bf16", action="store_true",
                   help="serve the bf16 flax path instead of int8")
    p.add_argument("--window", type=int, default=32,
                   help="dispatch-ahead depth of the result pipeline "
                   "(measured on a thin-link host: 4: 2.6k, 16: 4.1k, "
                   "32: 7.6k q/s — deeper hides more round-trip latency "
                   "at the cost of answer latency)")
    return p.parse_args(argv)


def main(argv=None):
    ns = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from xlxmert_tpu.core.checkpoint import load_any_checkpoint
    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.data.fast_tokenizer import FastTokenizer
    from xlxmert_tpu.data.io import GridFeatureReader, load_json
    from xlxmert_tpu.models.lxmert import serving_mode
    from xlxmert_tpu.serving import lxmert_int8 as engine
    from xlxmert_tpu.serving.feature_cache import FeatureCache
    from xlxmert_tpu.utils.boxes import box_position

    cfg = (LxmertConfig.load(ns.model_config) if ns.model_config
           else LxmertConfig())
    serving_mode(True)
    label2ans = load_json(ns.label2ans)
    tokenizer = FastTokenizer(ns.vocab)

    questions = [json.loads(l) for l in open(ns.questions) if l.strip()]
    print(f"{len(questions)} questions")
    if not questions:
        open(ns.output, "w").close()
        print("served 0 answers")
        return ns.output

    # catalog -> HBM (read-through reader: no duplicate host copy)
    reader = GridFeatureReader(ns.h5, cache=None)
    t0 = time.time()
    cache = FeatureCache.build(reader, reader.keys(), dtype=jnp.bfloat16)
    grid = int(np.sqrt(cache.table.shape[1]))
    print(f"feature cache: {cache.table.shape[0]} images, "
          f"{cache.nbytes/1e6:.0f} MB HBM, {time.time()-t0:.1f}s")

    missing = sorted({str(q["img_id"]) for q in questions}
                     - set(cache.index))
    if missing:
        raise SystemExit(
            f"{len(missing)} img_id(s) in --questions are absent from "
            f"the --h5 catalog (first few: {missing[:5]})")

    params = load_any_checkpoint(ns.load)
    params = params.get("params", params)
    B, L, V = ns.batch, ns.max_text_length, cache.table.shape[1]
    pos = jnp.broadcast_to(
        jnp.asarray(box_position(grid))[None], (B, V, 4)
    ).astype(jnp.bfloat16)

    def make_batches():
        out = []
        for s in range(0, len(questions), B):
            chunk = questions[s:s + B]
            n_valid = len(chunk)
            chunk = chunk + [chunk[-1]] * (B - n_valid)  # pad last batch
            ids = tokenizer.encode_batch([q["sent"] for q in chunk], L)
            mask = (ids > 0).astype(np.float32)
            picks = cache.indices([q["img_id"] for q in chunk])
            out.append((chunk[:n_valid], ids, picks, mask))
        return out

    all_batches = make_batches()

    dev = jax.devices()[0]
    if ns.bf16:
        from xlxmert_tpu.models.task_heads import VQAModel

        model = VQAModel(cfg, num_answers=len(label2ans),
                         dtype=jnp.bfloat16)
        # pin the tree on device once — numpy jit args re-upload per call
        dev_params = jax.device_put(jax.tree.map(
            lambda x: (np.asarray(x).astype(np.dtype(jnp.bfloat16))
                       if np.asarray(x).dtype in (np.float32, np.float64)
                       else np.asarray(x)), params), dev)

        @jax.jit
        def step(params, table, ids, picks, mask):
            feats = FeatureCache.lookup(table, picks)
            logits = model.apply({"params": params}, ids, feats, pos,
                                 attention_mask=mask, deterministic=True)
            return logits.argmax(-1)

        run = lambda ids, picks, mask: step(  # noqa: E731
            dev_params, cache.table, ids, picks, mask)
    else:
        # quantize_weight already places the int8 trees on device
        qp = engine.prepare_params(
            jax.tree.map(np.asarray, params["bert"]), cfg)
        hqp = engine.prepare_answer_head(
            jax.tree.map(np.asarray, params["answer_head"]))
        _, ids0, picks0, mask0 = all_batches[0]
        feats0 = np.asarray(
            FeatureCache.lookup(cache.table, jnp.asarray(picks0[:8])),
            np.float32)
        calib = engine.calibrate(
            qp, hqp, [(jnp.asarray(ids0[:8]), jnp.asarray(feats0),
                       pos[:8], jnp.asarray(mask0[:8]))], cfg)
        sqp = engine.apply_calibration(qp, calib)
        shqp = engine.apply_calibration(hqp, calib)
        engine.assert_fully_calibrated(sqp, shqp)

        @jax.jit
        def step(sqp, shqp, table, ids, picks, mask):
            feats = FeatureCache.lookup(table, picks)
            _, _, pooled = engine.lxmert_forward(
                sqp, ids, feats, pos, attention_mask=mask,
                n_heads=cfg.num_attention_heads)
            return engine.answer_head_forward(shqp, pooled).argmax(-1)

        run = lambda ids, picks, mask: step(  # noqa: E731
            sqp, shqp, cache.table, ids, picks, mask)

    # pipelined loop: dispatch stays WINDOW batches ahead of the
    # device->host result fetch, so transfers/compute overlap instead
    # of paying a full round-trip per batch (measured through the axon
    # tunnel at B=256: synchronous 838 q/s -> window 32: 7,560 q/s)
    from collections import deque

    WINDOW = ns.window
    n = 0
    t0 = None
    pending = deque()
    with open(ns.output, "w") as f:
        def flush_one():
            nonlocal n, t0
            chunk, dev_preds = pending.popleft()
            preds = np.asarray(dev_preds)
            if t0 is None:
                t0 = time.time()  # after the compile batch
            else:
                n += len(chunk)
            for q, p in zip(chunk, preds):
                f.write(json.dumps({
                    "question_id": q["question_id"],
                    "answer": label2ans[int(p)]}) + "\n")

        for chunk, ids, picks, mask in all_batches:
            pending.append((chunk, run(jnp.asarray(ids),
                                       jnp.asarray(picks),
                                       jnp.asarray(mask))))
            if len(pending) > WINDOW:
                flush_one()
        while pending:
            flush_one()
    path = "bf16" if ns.bf16 else "int8_static"
    if n and t0 is not None:
        print(f"served {len(questions)} answers ({path}); steady-state "
              f"{n/(max(time.time() - t0, 1e-9)):.1f} q/s")
    else:
        print(f"served {len(questions)} answers ({path})")
    return ns.output


if __name__ == "__main__":
    main()
