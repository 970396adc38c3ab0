"""One-command production-shape pipeline drive on the real TPU chip
(VERDICT r3 #6): extract (batched Detectron X-152-FPN, min-800/max-1333)
-> k-means (K=10,000, D=2048) -> pretrain (~100 steps, B=256, 9/5/5
model) -> VQA finetune + test-mode predict -> NAR sampling (B=64, 4
steps, 256px SPADE render) -> FID, all through the user-facing CLIs on
synthetic corpora at REAL shapes, logging wall-time per stage.

The CPU e2e suite (tests/test_cli_e2e.py) proves the plumbing at toy
shapes; this proves the factory on silicon. Transcript goes into
docs/TRAINING.md ("Production pipeline drive").

  python scripts/drive_pipeline_e2e.py --root /tmp/pipe_e2e
  python scripts/drive_pipeline_e2e.py --smoke --cpu   # plumbing check

Stage knobs default to the production recipe (reference
scripts/pretrain.bash; SURVEY.md §3) scaled to a single-chip,
synthetic-data drive: 160 images (-> 10,240 k-means rows >= 10k
centroids), 3 Lloyd iters (rate extrapolates to the 20-iter build),
1 pretrain epoch sized to ~100 optimizer steps at B=256.
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--root", default="/tmp/pipe_e2e")
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--smoke", action="store_true",
                    help="tiny shapes end-to-end (plumbing check; pair "
                    "with --cpu)")
parser.add_argument("--skip", default="",
                    help="comma list of stages to skip (reuse --root "
                    "artifacts): fixtures,extract,kmeans,pretrain,vqa,"
                    "sample,fid")
parser.add_argument("--n_images", type=int, default=None)
parser.add_argument("--pretrain_steps", type=int, default=None,
                    help="approx optimizer steps for the pretrain stage")
parser.add_argument("--batch_size", type=int, default=None,
                    help="pretrain batch (production 256)")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import xlxmert_tpu  # noqa: F401  (persistent compile cache)

SMOKE = args.smoke
GRID = 2 if SMOKE else 8
N_IMG = args.n_images or (12 if SMOKE else 160)
IMG_SIZE = 64 if SMOKE else 0          # 0 = reference min-800/max-1333
EXTRACT_BATCH = 4  # B=8 fp32 X-152 OOMs 16G HBM: the ResNeXt grouped
# convs' [B,H,W,32,8] layout pads the 8-lane dim to 128 (16x temp blow-up)
K = 10 if SMOKE else 10000
KM_ITERS = 2 if SMOKE else 3
B_PRE = args.batch_size or (8 if SMOKE else 256)
PRE_STEPS = args.pretrain_steps or (2 if SMOKE else 100)
B_VQA = 8 if SMOKE else 256
N_VQA_TRAIN = 16 if SMOKE else 2560
N_VQA_VALID = 8 if SMOKE else 512
B_SAMPLE = 2 if SMOKE else 64
TARGET = 8 if SMOKE else 256
G_BASE = 8 if SMOKE else 32
CODEBOOK = 8 if SMOKE else 256
N_ANSWERS = 3 if SMOKE else 3129

root = Path(args.root)
root.mkdir(parents=True, exist_ok=True)
skip = set(s for s in args.skip.split(",") if s)
# seed from a prior run so a --skip resume merges timings instead of
# clobbering the stages it skipped (ADVICE r4)
_times_path = root / "times.json"
times = json.loads(_times_path.read_text()) if _times_path.exists() else {}
rng = np.random.RandomState(0)

print(f"devices: {jax.devices()}  root: {root}  "
      f"mode: {'smoke' if SMOKE else 'production'}", flush=True)


def stage(name):
    def deco(fn):
        if name in skip:
            print(f"== {name}: SKIPPED (reusing {root})", flush=True)
            return
        print(f"== {name} ==", flush=True)
        t0 = time.time()
        fn()
        times[name] = time.time() - t0
        print(f"== {name}: {times[name]:.1f}s ==", flush=True)
        # persist incrementally: an interrupted run still leaves a
        # partial transcript for the docs table
        (root / "times.json").write_text(json.dumps(times, indent=1))
    return deco


WORDS = [f"w{i:03d}" for i in range(1000)]
IMG_IDS = [f"img{i:04d}" for i in range(N_IMG)]


def sent(r, lo=6, hi=13):
    return " ".join(r.choice(WORDS, r.randint(lo, hi)))


@stage("fixtures")
def _fixtures():
    """Synthetic corpora at real shapes: images (structured noise so
    features/clusters are non-degenerate), wordpiece vocab, pretrain
    caption json, VQA json + answer vocab, sampling sentences."""
    from PIL import Image

    img_dir = root / "images"
    img_dir.mkdir(exist_ok=True)
    for i, iid in enumerate(IMG_IDS):
        r = np.random.RandomState(1000 + i)
        if IMG_SIZE:
            h = w = IMG_SIZE
        else:
            h, w = 800, 1344        # reference max-1333 snapped to /32
        # low-frequency structure + noise (pure noise collapses k-means)
        base = r.rand(8, 8, 3)
        arr = np.asarray(Image.fromarray(
            (base * 255).astype(np.uint8)).resize((w, h)))
        arr = np.clip(arr + r.randint(-30, 30, arr.shape), 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(img_dir / f"{iid}.png")

    (root / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS)
        + "\n")

    n_caps = max(2, int(np.ceil(PRE_STEPS * B_PRE / N_IMG)))
    (root / "lxmert").mkdir(exist_ok=True)
    r = np.random.RandomState(2)
    corpus = [{"img_id": iid,
               "sentf": {"mscoco": [sent(r) for _ in range(n_caps)]}}
              for iid in IMG_IDS]
    (root / "lxmert" / "mscoco_train.json").write_text(json.dumps(corpus))
    valid = [{"img_id": iid, "sentf": {"mscoco": [sent(r), sent(r)]}}
             for iid in IMG_IDS[:8]]
    (root / "lxmert" / "mscoco_minival.json").write_text(json.dumps(valid))

    answers = ([f"a{i:04d}" for i in range(N_ANSWERS)])
    (root / "vqa").mkdir(exist_ok=True)
    r = np.random.RandomState(3)

    def vqa_split(n, start):
        return [{"question_id": start + q, "img_id": IMG_IDS[q % N_IMG],
                 "sent": sent(r, 4, 10),
                 "label": {answers[r.randint(N_ANSWERS)]: 1.0}}
                for q in range(n)]

    (root / "vqa" / "train.json").write_text(
        json.dumps(vqa_split(N_VQA_TRAIN, 0)))
    (root / "vqa" / "minival.json").write_text(
        json.dumps(vqa_split(N_VQA_VALID, 10 ** 6)))
    (root / "vqa" / "trainval_ans2label.json").write_text(
        json.dumps({a: i for i, a in enumerate(answers)}))
    (root / "vqa" / "trainval_label2ans.json").write_text(
        json.dumps(answers))

    r = np.random.RandomState(4)
    (root / "sentences.txt").write_text(
        "\n".join(sent(r) for _ in range(B_SAMPLE)) + "\n")


H5 = root / "mscoco_imgfeat" / ("maskrcnn_train_grid%d.h5" % GRID)
CENT = (root / "cluster_centroids" /
        f"maskrcnn_mscoco_train_centroids{K}_iter{KM_ITERS}"
        f"_d2048_grid{GRID}.npy")
PKL = (root / "cluster_ids" /
       f"maskrcnn_train_img_id_to_cluster_id_{K}_iter{KM_ITERS}"
       f"_d2048_grid{GRID}.pkl")


@stage("extract")
def _extract():
    """Batched Detectron X-152-FPN grid features at the reference's
    min-800/max-1333 canvas (batch=8 vs the reference's batch=1 CUDA
    loop) — random-init weights: rate measurement + pipeline contract,
    not feature quality."""
    from xlxmert_tpu.cli.extract_features import main

    argv = ["--images_dir", str(root / "images"), "--out", str(H5),
            "--grid_size", str(GRID), "--batch_size", str(EXTRACT_BATCH),
            "--image_size", str(IMG_SIZE or 0)]
    argv += ["--arch", "maskrcnn"] if not SMOKE else []
    if SMOKE:
        argv += ["--image_size", "64"]
    main(argv)
    import h5py

    with h5py.File(H5) as f:
        n = len(f.keys())
    print(f"extracted {n} images -> {H5}", flush=True)


@stage("kmeans")
def _kmeans():
    """Production-vocabulary build: K=10,000 centroids over the
    extracted rows (MXU Lloyd's; the reference is an hours-scale faiss
    job, run_kmeans.py:96-113) + 1-NN assignment pkl."""
    from xlxmert_tpu.cli.run_kmeans import main

    main(["--src_h5", str(H5),
          "--out_dir", str(root / "cluster_centroids"),
          "--cluster_dir", str(root / "cluster_ids"),
          "--n_centroids", str(K), "--n_iter", str(KM_ITERS),
          "--grid_size", str(GRID)])
    assert CENT.exists() and PKL.exists(), (CENT, PKL)


@stage("pretrain")
def _pretrain():
    """~100 optimizer steps at B=256 of the production 9/5/5 recipe
    (reference pretrain.bash flags) + one eval epoch + epoch ckpt."""
    from xlxmert_tpu.cli.pretrain import main

    argv = ["--taskMaskLM", "--taskObjPredict", "--taskMatched",
            "--visualLosses", "obj", "--vis_mask_predict", "--clustering",
            "--grid_model", "--grid_size", str(GRID),
            "--num_clusters", str(K), "--epochs", "1",
            "--batchSize", str(B_PRE),
            "--train", "mscoco_train", "--valid", "mscoco_minival",
            "--data_root", str(root), "--vocab", str(root / "vocab.txt"),
            "--centroid_path", str(CENT), "--cluster_pkl", str(PKL),
            "--output", str(root / "snap_pretrain"),
            "--fromScratch", "--seed", "1"]
    if SMOKE:
        argv += ["--model_config", str(root / "model.yaml"), "--fp32"]
        from xlxmert_tpu.core.config import LxmertConfig

        LxmertConfig(vocab_size=1005, hidden_size=32, num_attention_heads=4,
                     intermediate_size=64, l_layers=1, x_layers=1,
                     r_layers=1, num_clusters=K,
                     num_qa_labels=N_ANSWERS).save(str(root / "model.yaml"))
    main(argv)
    assert (root / "snap_pretrain" / "Epoch01_LXRT.msgpack").exists()


@stage("vqa")
def _vqa():
    """Finetune 1 epoch from the pretrain checkpoint, then test-mode
    prediction dump (the leaderboard contract)."""
    from xlxmert_tpu.cli.vqa import main

    valid_h5 = H5.parent / H5.name.replace("train", "valid")
    if not valid_h5.exists():
        valid_h5.symlink_to(H5)

    base = ["--data_root", str(root), "--vocab", str(root / "vocab.txt"),
            "--grid_size", str(GRID), "--batchSize", str(B_VQA)]
    if SMOKE:
        base += ["--model_config", str(root / "model.yaml"), "--fp32"]
    main(base + ["--train", "train", "--valid", "minival",
                 "--epochs", "1",
                 "--loadLXMERT",
                 str(root / "snap_pretrain" / "Epoch01_LXRT.msgpack"),
                 "--output", str(root / "snap_vqa")])
    main(base + ["--test", "minival",
                 "--load", str(root / "snap_vqa" / "BEST.msgpack"),
                 "--output", str(root / "snap_vqa")])
    preds = json.loads((root / "snap_vqa" /
                        "vqa_minival_predict.json").read_text())
    print(f"vqa predictions: {len(preds)}", flush=True)


@stage("sample")
def _sample():
    """NAR mask-predict sampling (B=64, 4 steps) + 256px SPADE render
    through a random-init production-shape generator."""
    import jax.numpy as jnp

    from xlxmert_tpu.cli.sample_images import main
    from xlxmert_tpu.core.checkpoint import save_pytree
    from xlxmert_tpu.models.gan import Generator

    feat_dim = int(np.load(CENT).shape[1])
    gpath = root / "G_random.msgpack"
    if not gpath.exists():
        gen = Generator(emb_dim=feat_dim, base_dim=G_BASE,
                        target_size=TARGET, init_H=GRID, init_W=GRID,
                        codebook_dim=CODEBOOK)
        with jax.default_device(jax.devices("cpu")[0]):
            g_vars = gen.init(
                {"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)},
                jnp.zeros((1, GRID, GRID, feat_dim)), train=True)
        save_pytree({"params": g_vars["params"],
                     "sn": g_vars.get("sn", {})}, str(gpath))

    argv = ["--load", str(root / "snap_pretrain" / "Epoch01_LXRT.msgpack"),
            "--centroids", str(CENT), "--vocab", str(root / "vocab.txt"),
            "--sentences", str(root / "sentences.txt"),
            "--grid_size", str(GRID), "--sample_steps",
            "2" if SMOKE else "4",
            "--batch_size", str(B_SAMPLE), "--generator", str(gpath),
            "--target_size", str(TARGET), "--g_base_dim", str(G_BASE),
            "--codebook_dim", str(CODEBOOK),
            "--output", str(root / "samples")]
    if SMOKE:
        argv += ["--model_config", str(root / "model.yaml")]
    main(argv)
    pngs = list((root / "samples").glob("*.png"))
    assert pngs, "no renders written"
    print(f"rendered {len(pngs)} images", flush=True)


@stage("fid")
def _fid():
    """FID between the renders and the synthetic 'real' corpus —
    random-init extractor (relative mode): pipeline contract + rate,
    not a quality claim (paper-comparable FID needs pt_inception
    weights, docs/COMPONENTS.md §5)."""
    from xlxmert_tpu.cli.eval_fid import main

    main(["--real_dir", str(root / "images"),
          "--fake_dir", str(root / "samples"),
          "--image_size", str(TARGET),
          "--batch_size", str(min(B_SAMPLE, 64)),
          "--max_images", str(N_IMG)])


print("\n== pipeline wall-time table ==")
for k, v in times.items():
    print(f"  {k:10s} {v:8.1f} s")
print(f"  {'TOTAL':10s} {sum(times.values()):8.1f} s")
print("OK")
