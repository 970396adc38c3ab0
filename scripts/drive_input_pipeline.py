"""Prove the HOST input pipeline at device rate (VERDICT r2 item #7;
SURVEY §7 "Input pipeline throughput" risk).

The device-rate figure (bench.py pretrain leg, ~1.6k ex/s) times
`chained_train_step` on one resident batch. This drive feeds the REAL
path instead — PretrainDataset.batches (tokenize + negative sampling +
cluster lookups) -> PrefetchLoader -> group k batches -> place_stacked
-> chained_train_step(per_step_batches=True) — on production-size
synthetic fixtures (vocab 30522, B=256, 8x8 grid, 10k clusters), and
reports:

  loader-only ex/s      pure host production rate (no device)
  end-to-end ex/s       sustained rate incl. host + upload + step

Usage:
  python scripts/drive_input_pipeline.py                # real TPU
  python scripts/drive_input_pipeline.py --loader_only  # host only (any box)
  python scripts/drive_input_pipeline.py --cpu --examples 2000 --chain 2
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


WORDS = None


def synth_vocab(path, n=30522):
    """bert-base-uncased-shaped vocab: specials + synthetic wordpieces."""
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    rng = np.random.RandomState(0)
    body = []
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    seen = set(specials)
    while len(body) < n - len(specials):
        w = "".join(rng.choice(list(alphabet),
                               size=rng.randint(2, 9)))
        if rng.rand() < 0.3:
            w = "##" + w
        if w not in seen:
            seen.add(w)
            body.append(w)
    with open(path, "w") as f:
        f.write("\n".join(specials + body) + "\n")
    return [w for w in body if not w.startswith("##")]


def synth_corpus(words, n_images, sents_per_image, seed=0):
    rng = np.random.RandomState(seed)
    corpus = []
    for i in range(n_images):
        sents = [" ".join(rng.choice(words, size=rng.randint(5, 16)))
                 for _ in range(sents_per_image)]
        corpus.append({"img_id": f"img{i:06d}",
                       "sentf": {"mscoco": sents}})
    return corpus


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--loader_only", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--examples", type=int, default=40_000)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--depth", type=int, default=6,
                    help="PrefetchLoader queue depth")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from xlxmert_tpu.core.config import LxmertConfig, TrainConfig
    from xlxmert_tpu.data.datasets import PretrainDataset
    from xlxmert_tpu.data.fast_tokenizer import FastTokenizer
    from xlxmert_tpu.data.io import ClusterMap, PrefetchLoader

    tmp = tempfile.mkdtemp(prefix="xlt_pipe_")
    vocab_path = os.path.join(tmp, "vocab.txt")
    words = synth_vocab(vocab_path)
    tokenizer = FastTokenizer(vocab_path)
    print(f"tokenizer native: {tokenizer.native}")

    n_images = max(args.examples // 5, 64)
    corpus = synth_corpus(words, n_images, 5)
    rng = np.random.RandomState(1)
    cluster_pkl = os.path.join(tmp, "clusters.pkl")
    with open(cluster_pkl, "wb") as f:
        pickle.dump({d["img_id"]: rng.randint(0, 10000, (64,))
                     .astype(np.int64) for d in corpus}, f)

    ds = PretrainDataset(corpus, tokenizer, ClusterMap(cluster_pkl),
                         topk=args.examples,
                         vis_mask_sources={"mscoco"})
    print(f"{len(ds)} examples, B={args.batch}")

    # ---- loader-only host rate -------------------------------------------
    for r in range(2):
        t0 = time.time()
        n = 0
        for batch in ds.batches(args.batch, shuffle=True, seed=r):
            n += batch["n_valid"]
        dt = time.time() - t0
        print(f"loader-only pass {r}: {n / dt:,.0f} ex/s host "
              f"({dt:.1f}s for {n} examples)")
    loader_rate = n / dt
    if args.loader_only:
        return

    # ---- end to end -------------------------------------------------------
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from xlxmert_tpu.tasks.pretrain import PretrainEngine

    cfg = TrainConfig(batch_size=args.batch)
    model_cfg = LxmertConfig()
    eng = PretrainEngine(cfg, model_cfg=model_cfg, total_steps=10_000)
    state = eng.create_state(jax.random.PRNGKey(0))
    centroids = jnp.asarray(
        np.random.RandomState(2).randn(10000, 2048).astype(np.float32)
        * 0.05)
    rng_key = jax.random.PRNGKey(3)
    step_fn = eng.chained_train_step("vis_mask", args.chain,
                                     per_step_batches=True)

    def clean(b):
        b.pop("uids", None)
        b.pop("n_valid", None)
        return b

    def grouped(seed):
        group = []
        for b in PrefetchLoader(
                lambda: ds.batches(args.batch, shuffle=True, seed=seed),
                depth=args.depth):
            group.append(clean(b))
            if len(group) == args.chain:
                yield eng.place_stacked(group)
                group = []

    # warm-up: compile the chained step on the first group
    g0 = next(grouped(100))
    state, loss = step_fn(state, g0, rng_key, centroids)
    float(np.asarray(loss))
    print("compiled; timing end-to-end...")

    for r in range(args.rounds):
        t0 = time.time()
        n_steps = 0
        # prefetch PLACED groups too: stacking + device upload overlap
        # with the running step instead of serializing after it
        for stacked in PrefetchLoader(lambda s=r: grouped(200 + s),
                                      depth=2):
            state, loss = step_fn(state, stacked, rng_key, centroids)
            n_steps += args.chain
        float(np.asarray(loss))  # drain
        dt = time.time() - t0
        ex_s = n_steps * args.batch / dt
        print(f"end-to-end pass {r}: {ex_s:,.0f} ex/s sustained "
              f"({n_steps} steps in {dt:.1f}s)")
    print(f"summary: loader {loader_rate:,.0f} ex/s | "
          f"end-to-end {ex_s:,.0f} ex/s | device-only reference: bench.py "
          f"pretrain leg")


if __name__ == "__main__":
    main()
