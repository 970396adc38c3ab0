"""Drive the user-facing serving CLI (cli/serve.py) at production size
on the default platform (TPU): synthetic COCO-like world on disk ->
checkpoint + h5 -> HBM feature cache -> int8 answers jsonl, reporting
the CLI's own steady-state and wall-clock q/s.

This is the round-2 measurement (7,560 q/s through the dev tunnel at
B=256) as a repeatable script, re-run after any serve.py change.

Usage: python scripts/drive_serve_cli.py [--images 512] [--questions 8192]
       [--batch 256] [--bf16]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--questions", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--bf16", action="store_true")
    ns = ap.parse_args()

    import h5py
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.cli.serve import main as serve_main
    from xlxmert_tpu.core.checkpoint import save_pytree
    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.models.task_heads import VQAModel

    print("devices:", jax.devices())
    cfg = LxmertConfig(num_clusters=0)  # production 9/5/5, 768h
    root = tempfile.mkdtemp(prefix="serve_drive_")
    cfg.save(os.path.join(root, "model.yaml"))

    rng = np.random.RandomState(0)
    t0 = time.time()
    with h5py.File(os.path.join(root, "grid8.h5"), "w") as f:
        feats = (rng.randn(ns.images, 8, 8, 2048) * 0.3).astype(np.float32)
        for i in range(ns.images):
            f.create_group(f"img_{i}").create_dataset(
                "features", data=feats[i])
    print(f"h5: {ns.images} images, {time.time()-t0:.1f}s")

    # real wordpiece vocab is not needed for throughput — a small vocab
    # with production token-id RANGE via random sentences
    words = [f"tok{i}" for i in range(200)]
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        for t in ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words:
            f.write(t + "\n")
    answers = [f"ans{i}" for i in range(3129)]  # VQA answer-vocab size
    with open(os.path.join(root, "label2ans.json"), "w") as f:
        json.dump(answers, f)
    with open(os.path.join(root, "qs.jsonl"), "w") as f:
        for i in range(ns.questions):
            q = {"question_id": i, "img_id": f"img_{i % ns.images}",
                 "sent": " ".join(rng.choice(words, 8))}
            f.write(json.dumps(q) + "\n")

    # production-size params on the HOST cpu backend (fast init; the
    # CLI re-places them on the TPU)
    t0 = time.time()
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        model = VQAModel(cfg, num_answers=len(answers), dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((2, 20), jnp.int32),
            jnp.zeros((2, 64, 2048)), jnp.zeros((2, 64, 4)),
            attention_mask=jnp.ones((2, 20)))["params"]
        save_pytree(jax.tree.map(np.asarray, params),
                    os.path.join(root, "BEST.msgpack"))
    print(f"checkpoint: {time.time()-t0:.1f}s")

    argv = ["--load", os.path.join(root, "BEST.msgpack"),
            "--model_config", os.path.join(root, "model.yaml"),
            "--h5", os.path.join(root, "grid8.h5"),
            "--vocab", os.path.join(root, "vocab.txt"),
            "--label2ans", os.path.join(root, "label2ans.json"),
            "--questions", os.path.join(root, "qs.jsonl"),
            "--batch", str(ns.batch),
            "--output", os.path.join(root, "answers.jsonl")]
    if ns.bf16:
        argv.append("--bf16")
    t0 = time.time()
    serve_main(argv)
    wall = time.time() - t0
    n_out = sum(1 for _ in open(os.path.join(root, "answers.jsonl")))
    assert n_out == ns.questions, (n_out, ns.questions)
    print(f"serve CLI wall (incl. cache build + calibration + compile): "
          f"{wall:.1f}s; {n_out} answers written")


if __name__ == "__main__":
    main()
