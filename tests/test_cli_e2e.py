"""End-to-end CLI pipeline on synthetic fixtures (8-device CPU mesh):
extract_features -> run_kmeans -> pretrain -> vqa finetune/test ->
sample_images. This drives the user-facing surface of every stage of the
framework exactly the way the reference bash scripts do (SURVEY.md §3)."""
import json
import sys

import numpy as np
import pytest

import jax

from xlxmert_tpu.core.config import LxmertConfig

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "dog", "cat", "runs", "sits", "red", "blue", "park", "ball"]
GRID = 2  # 64px images -> resnet layer4 is 2x2


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Shared fixture dir with images, vocab, corpora, model config."""
    from PIL import Image

    root = tmp_path_factory.mktemp("world")
    (root / "images").mkdir()
    rng = np.random.RandomState(0)
    for i in range(12):
        arr = rng.randint(0, 255, (64, 64, 3), np.uint8)
        Image.fromarray(arr).save(root / "images" / f"img{i:02d}.png")

    (root / "vocab.txt").write_text("\n".join(VOCAB) + "\n")

    model_cfg = LxmertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_attention_heads=4,
        intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=2048, num_qa_labels=3, num_clusters=10)
    model_cfg.save(str(root / "model.yaml"))

    img_ids = [f"img{i:02d}" for i in range(12)]
    # pretrain corpus
    (root / "lxmert").mkdir()
    corpus = [{"img_id": i, "sentf": {"mscoco": ["a dog runs", "a red ball"]}}
              for i in img_ids]
    (root / "lxmert" / "mscoco_train.json").write_text(json.dumps(corpus))
    (root / "lxmert" / "mscoco_minival.json").write_text(
        json.dumps(corpus[:4]))

    # vqa fixtures
    (root / "vqa").mkdir()
    vqa = [{"question_id": q, "img_id": img_ids[q % 12],
            "sent": "a dog runs in a park",
            "label": {"dog": 1.0}} for q in range(16)]
    (root / "vqa" / "train.json").write_text(json.dumps(vqa))
    (root / "vqa" / "minival.json").write_text(json.dumps(vqa[:8]))
    (root / "vqa" / "trainval_ans2label.json").write_text(
        json.dumps({"dog": 0, "cat": 1, "red": 2}))
    (root / "vqa" / "trainval_label2ans.json").write_text(
        json.dumps(["dog", "cat", "red"]))

    (root / "sentences.txt").write_text("a dog runs\na red ball\n")
    return root


def test_step1_extract_features(world):
    from xlxmert_tpu.cli.extract_features import main

    out = world / "mscoco_imgfeat" / "maskrcnn_train_grid2.h5"
    main(["--images_dir", str(world / "images"), "--out", str(out),
          "--grid_size", str(GRID), "--image_size", "64",
          "--batch_size", "4"])
    import h5py

    with h5py.File(out) as f:
        assert len(f.keys()) == 12
        assert f["img00"]["features"].shape == (GRID, GRID, 2048)


def test_step2_kmeans(world):
    from xlxmert_tpu.cli.run_kmeans import main

    h5 = world / "mscoco_imgfeat" / "maskrcnn_train_grid2.h5"
    main(["--src_h5", str(h5), "--out_dir", str(world / "cluster_centroids"),
          "--cluster_dir", str(world / "cluster_ids"),
          "--n_centroids", "10", "--n_iter", "3",
          "--grid_size", str(GRID)])
    cpath = (world / "cluster_centroids" /
             "maskrcnn_mscoco_train_centroids10_iter3_d2048_grid2.npy")
    assert cpath.exists()
    assert np.load(cpath).shape == (10, 2048)
    import pickle

    pkl = (world / "cluster_ids" /
           "maskrcnn_train_img_id_to_cluster_id_10_iter3_d2048"
           "_grid2.pkl")
    with open(pkl, "rb") as f:
        mapping = pickle.load(f)
    assert len(mapping) == 12 and mapping["img00"].shape == (GRID * GRID,)


def test_step3_pretrain(world):
    from xlxmert_tpu.cli.pretrain import main

    cpath = (world / "cluster_centroids" /
             "maskrcnn_mscoco_train_centroids10_iter3_d2048_grid2.npy")
    pkl = (world / "cluster_ids" /
           "maskrcnn_train_img_id_to_cluster_id_10_iter3_d2048"
           "_grid2.pkl")
    main(["--taskMaskLM", "--taskObjPredict", "--taskMatched",
          "--visualLosses", "obj", "--vis_mask_predict", "--clustering",
          "--grid_model", "--grid_size", str(GRID),
          "--num_clusters", "10", "--epochs", "1", "--batchSize", "8",
          "--train", "mscoco_train", "--valid", "mscoco_minival",
          "--data_root", str(world), "--vocab", str(world / "vocab.txt"),
          "--centroid_path", str(cpath), "--cluster_pkl", str(pkl),
          "--model_config", str(world / "model.yaml"),
          "--output", str(world / "snap_pretrain"), "--fp32",
          "--seed", "1", "--profile", "1"])
    assert (world / "snap_pretrain" / "Epoch01_LXRT.msgpack").exists()
    assert (world / "snap_pretrain" / "log.txt").exists()
    # --profile wrote a jax.profiler trace (epoch may be shorter than
    # warmup+window; the stop-at-epoch-end path still flushes it)
    prof = world / "snap_pretrain" / "profile"
    assert prof.exists() and any(prof.rglob("*"))
    scalars = [json.loads(l) for l in
               open(world / "snap_pretrain" / "scalars.jsonl")]
    assert any("valid/vis_mask" in s for s in scalars)


def test_step3b_pretrain_bert_init(world):
    """Reference-default BERT init (lxmert_pretrain.py:58-61): the language
    stack starts from the converted torch checkpoint; --fromScratch opts
    out (param.py:90-93)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from xlxmert_tpu.cli.pretrain import main

    tcfg = transformers.BertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64)
    torch.manual_seed(0)
    tmodel = transformers.BertForPreTraining(tcfg)
    bert_path = world / "bert_tiny.bin"
    torch.save(tmodel.state_dict(), str(bert_path))

    cpath = (world / "cluster_centroids" /
             "maskrcnn_mscoco_train_centroids10_iter3_d2048_grid2.npy")
    pkl = (world / "cluster_ids" /
           "maskrcnn_train_img_id_to_cluster_id_10_iter3_d2048"
           "_grid2.pkl")
    base = ["--taskMaskLM", "--taskObjPredict", "--taskMatched",
            "--visualLosses", "obj", "--vis_mask_predict", "--clustering",
            "--grid_model", "--grid_size", str(GRID),
            "--num_clusters", "10", "--epochs", "1", "--batchSize", "8",
            "--train", "mscoco_train", "--valid", "mscoco_minival",
            "--data_root", str(world), "--vocab", str(world / "vocab.txt"),
            "--centroid_path", str(cpath), "--cluster_pkl", str(pkl),
            "--model_config", str(world / "model.yaml"), "--fp32",
            "--seed", "1", "--dry"]
    out = world / "snap_bert_init"
    main(base + ["--output", str(out), "--bert_weights", str(bert_path)])
    log = (out / "log.txt").read_text()
    assert "BERT init from" in log
    # the saved epoch checkpoint carries the BERT word embeddings (--dry
    # skips training, so the overlay is untouched)
    from xlxmert_tpu.core.checkpoint import load_pytree

    ck = load_pytree(str(out / "Epoch01_LXRT.msgpack"))
    np.testing.assert_allclose(
        ck["bert"]["embeddings"]["word_embeddings"]["embedding"],
        tmodel.bert.embeddings.word_embeddings.weight.detach().numpy(),
        atol=1e-6)

    out2 = world / "snap_from_scratch"
    main(base + ["--output", str(out2), "--fromScratch",
                 "--bert_weights", str(bert_path)])
    log2 = (out2 / "log.txt").read_text()
    assert "ignoring --bert_weights" in log2
    ck2 = load_pytree(str(out2 / "Epoch01_LXRT.msgpack"))
    assert not np.allclose(
        ck2["bert"]["embeddings"]["word_embeddings"]["embedding"],
        tmodel.bert.embeddings.word_embeddings.weight.detach().numpy())


def test_step3c_pretrain_bbox_path(world):
    """The non-grid / non-clustering pretrain variant: bbox h5 in
    (features/obj_id/boxes/img_w/img_h, C17 contract), detector-vocab obj
    head + exact-feature regression (reference lxmert_pretrain.py:723-741,
    lxmert_data.py:277-344)."""
    import h5py
    from xlxmert_tpu.cli.pretrain import main

    n_boxes = 4
    rng = np.random.RandomState(7)
    bbox_h5 = world / "maskrcnn_train_boxes4.h5"
    with h5py.File(bbox_h5, "w") as f:
        for i in range(12):
            g = f.create_group(f"img{i:02d}")
            g.create_dataset("features", data=rng.randn(
                n_boxes, 2048).astype(np.float32))
            g.create_dataset("obj_id", data=rng.randint(0, 7, (n_boxes,)))
            boxes = np.abs(rng.randn(n_boxes, 4)).astype(np.float32) * 50
            boxes[:, 2:] += boxes[:, :2]
            g.create_dataset("boxes", data=boxes)
            g.create_dataset("img_w", data=64)
            g.create_dataset("img_h", data=64)

    out = world / "snap_bbox"
    main(["--taskMaskLM", "--taskObjPredict", "--taskMatched",
          "--visualLosses", "obj,feat", "--target_obj_id",
          "--feed_exact_feat", "--target_exact_feat",
          "--n_boxes", str(n_boxes), "--bbox_h5", str(bbox_h5),
          "--epochs", "1", "--batchSize", "8",
          "--train", "mscoco_train", "--valid", "mscoco_minival",
          "--data_root", str(world), "--vocab", str(world / "vocab.txt"),
          "--model_config", str(world / "model.yaml"),
          "--output", str(out), "--fp32", "--seed", "1", "--fromScratch"])
    assert (out / "Epoch01_LXRT.msgpack").exists()
    scalars = [json.loads(l) for l in open(out / "scalars.jsonl")]
    assert any("valid/vis_mask" in s for s in scalars)


def test_step3d_pretrain_grid_exact_feat_path(world):
    """The non-clustering GRID variant (reference lxmert_data.py:186-193
    routes grid_model runs to grid h5): exact grid features as the
    visual input + masked-feature regression, no cluster vocabulary."""
    from xlxmert_tpu.cli.pretrain import main

    grid_h5 = world / "mscoco_imgfeat" / "maskrcnn_train_grid2.h5"
    out = world / "snap_gridfeat"
    main(["--taskMaskLM", "--taskObjPredict", "--taskMatched",
          "--visualLosses", "feat", "--vis_mask_predict",
          "--grid_model", "--grid_size", str(GRID),
          "--feed_exact_feat", "--target_exact_feat",
          "--grid_h5", str(grid_h5),
          "--epochs", "1", "--batchSize", "8",
          "--train", "mscoco_train", "--valid", "mscoco_minival",
          "--data_root", str(world), "--vocab", str(world / "vocab.txt"),
          "--model_config", str(world / "model.yaml"),
          "--output", str(out), "--fp32", "--seed", "1", "--fromScratch"])
    assert (out / "Epoch01_LXRT.msgpack").exists()
    scalars = [json.loads(l) for l in open(out / "scalars.jsonl")]
    assert any("valid/vis_mask" in s for s in scalars)


def test_step3e_pretrain_full_state_resume(world):
    """--save_full_state writes Epoch%02d_FULL.msgpack; --load of it
    exact-resumes (optimizer + step restored; engine-level bit-equality
    is pinned in test_checkpoint.py — this covers the CLI wiring)."""
    from xlxmert_tpu.cli.pretrain import main

    cpath = (world / "cluster_centroids" /
             "maskrcnn_mscoco_train_centroids10_iter3_d2048_grid2.npy")
    pkl = (world / "cluster_ids" /
           "maskrcnn_train_img_id_to_cluster_id_10_iter3_d2048"
           "_grid2.pkl")
    out = world / "snap_fullstate"
    base = ["--taskMaskLM", "--taskObjPredict", "--taskMatched",
            "--visualLosses", "obj", "--vis_mask_predict", "--clustering",
            "--grid_model", "--grid_size", str(GRID),
            "--num_clusters", "10", "--batchSize", "8",
            "--train", "mscoco_train", "--valid", "mscoco_minival",
            "--data_root", str(world), "--vocab", str(world / "vocab.txt"),
            "--centroid_path", str(cpath), "--cluster_pkl", str(pkl),
            "--model_config", str(world / "model.yaml"),
            "--output", str(out), "--fp32", "--seed", "1", "--fromScratch",
            "--save_full_state"]
    main(base + ["--epochs", "1"])
    full = out / "Epoch01_FULL.msgpack"
    assert full.exists()
    main(base + ["--epochs", "2", "--load", str(full)])
    assert (out / "Epoch02_LXRT.msgpack").exists()
    log = (out / "log.txt").read_text()
    assert "exact-resumed full train state" in log


def test_step4_vqa_finetune_and_test(world):
    from xlxmert_tpu.cli.vqa import main

    # valid/minival splits route to the *_valid_* h5 (vqa_data.py:105-118)
    valid_h5 = world / "mscoco_imgfeat" / "maskrcnn_valid_grid2.h5"
    if not valid_h5.exists():
        valid_h5.symlink_to(world / "mscoco_imgfeat" /
                            "maskrcnn_train_grid2.h5")

    args = ["--train", "train", "--valid", "minival",
            "--epochs", "1", "--batchSize", "8",
            "--data_root", str(world), "--vocab", str(world / "vocab.txt"),
            "--model_config", str(world / "model.yaml"),
            "--grid_size", str(GRID),
            "--load_lxmert" if False else "--loadLXMERT",
            str(world / "snap_pretrain" / "Epoch01_LXRT.msgpack"),
            "--output", str(world / "snap_vqa"), "--fp32"]
    main(args)
    assert (world / "snap_vqa" / "BEST.msgpack").exists()

    # test mode: prediction dump
    main(["--test", "minival", "--batchSize", "8",
          "--data_root", str(world), "--vocab", str(world / "vocab.txt"),
          "--model_config", str(world / "model.yaml"),
          "--grid_size", str(GRID),
          "--load", str(world / "snap_vqa" / "BEST.msgpack"),
          "--output", str(world / "snap_vqa"), "--fp32"])
    preds = json.loads((world / "snap_vqa" /
                        "vqa_minival_predict.json").read_text())
    assert len(preds) == 8
    assert all(p["answer"] in ("dog", "cat", "red") for p in preds)

    # --serve_int8: the int8 engine serves the same dump contract
    main(["--test", "minival", "--batchSize", "8", "--serve_int8",
          "--data_root", str(world), "--vocab", str(world / "vocab.txt"),
          "--model_config", str(world / "model.yaml"),
          "--grid_size", str(GRID),
          "--load", str(world / "snap_vqa" / "BEST.msgpack"),
          "--output", str(world / "snap_vqa"), "--fp32"])
    preds_i8 = json.loads((world / "snap_vqa" /
                           "vqa_minival_predict.json").read_text())
    assert len(preds_i8) == 8
    agree = np.mean([a["answer"] == b["answer"]
                     for a, b in zip(preds, preds_i8)])
    assert agree >= 0.75, agree


def test_step5_sample_images(world):
    from xlxmert_tpu.cli.sample_images import main

    cpath = (world / "cluster_centroids" /
             "maskrcnn_mscoco_train_centroids10_iter3_d2048_grid2.npy")
    main(["--load", str(world / "snap_pretrain" / "Epoch01_LXRT.msgpack"),
          "--centroids", str(cpath),
          "--vocab", str(world / "vocab.txt"),
          "--sentences", str(world / "sentences.txt"),
          "--model_config", str(world / "model.yaml"),
          "--grid_size", str(GRID), "--sample_steps", "2",
          "--batch_size", "2",
          "--output", str(world / "samples")])
    codes = sorted((world / "samples").glob("codes_*.npy"))
    assert codes, "no code grids written"
    arr = np.load(codes[0])
    assert arr.shape == (2, GRID * GRID)
    assert (arr >= 0).all() and (arr < 10).all()


def test_step5b_sample_images_intermediate_renders(world):
    """--save_intermediate: per-step renders (imggen_model.py:245-248)."""
    import jax.numpy as jnp

    from xlxmert_tpu.cli.sample_images import main
    from xlxmert_tpu.core.checkpoint import save_pytree
    from xlxmert_tpu.models.gan import Generator

    cpath = (world / "cluster_centroids" /
             "maskrcnn_mscoco_train_centroids10_iter3_d2048_grid2.npy")
    feat_dim = np.load(cpath).shape[1]
    gen = Generator(emb_dim=feat_dim, base_dim=8, target_size=8,
                    init_H=GRID, init_W=GRID, codebook_dim=8)
    g_vars = gen.init({"params": jax.random.PRNGKey(0), "noise":
                       jax.random.PRNGKey(1)},
                      jnp.zeros((1, GRID, GRID, feat_dim)), train=True)
    gpath = world / "G_tiny.msgpack"
    save_pytree({"params": g_vars["params"], "sn": g_vars.get("sn", {})},
                str(gpath))

    steps = 2
    main(["--load", str(world / "snap_pretrain" / "Epoch01_LXRT.msgpack"),
          "--centroids", str(cpath),
          "--vocab", str(world / "vocab.txt"),
          "--sentences", str(world / "sentences.txt"),
          "--model_config", str(world / "model.yaml"),
          "--grid_size", str(GRID), "--sample_steps", str(steps),
          "--batch_size", "2", "--generator", str(gpath),
          "--target_size", "8", "--g_base_dim", "8", "--codebook_dim", "8",
          "--save_intermediate",
          "--output", str(world / "samples_inter")])
    finals = list((world / "samples_inter").glob("*.png"))
    assert finals, "no final renders"
    for t in range(steps):
        step_pngs = list((world / "samples_inter" / f"step{t}").glob("*.png"))
        assert step_pngs, f"no intermediate renders for step {t}"


def test_step6_nlvr2_cli(world):
    from xlxmert_tpu.cli.nlvr2 import main

    (world / "nlvr2").mkdir(exist_ok=True)
    img_ids = [f"img{i:02d}" for i in range(12)]
    data = [{"uid": f"u{q}", "img0": img_ids[q % 12],
             "img1": img_ids[(q + 3) % 12], "sent": "a dog runs",
             "label": q % 2, "identifier": f"id-{q}"} for q in range(12)]
    (world / "nlvr2" / "train.json").write_text(json.dumps(data))
    (world / "nlvr2" / "valid.json").write_text(json.dumps(data[:6]))
    feat_dir = world / "nlvr2_imgfeat"
    feat_dir.mkdir(exist_ok=True)
    for split in ("train", "valid"):
        link = feat_dir / f"maskrcnn_{split}_grid2.h5"
        if not link.exists():
            link.symlink_to(world / "mscoco_imgfeat" /
                            "maskrcnn_train_grid2.h5")

    main(["--train", "train", "--valid", "valid", "--epochs", "1",
          "--batchSize", "8", "--data_root", str(world),
          "--vocab", str(world / "vocab.txt"),
          "--model_config", str(world / "model.yaml"),
          "--grid_size", str(GRID),
          "--output", str(world / "snap_nlvr2"), "--fp32"])
    assert (world / "snap_nlvr2" / "BEST.msgpack").exists()

    # CSV dump in test mode
    main(["--test", "valid", "--batchSize", "8",
          "--data_root", str(world), "--vocab", str(world / "vocab.txt"),
          "--model_config", str(world / "model.yaml"),
          "--grid_size", str(GRID),
          "--load", str(world / "snap_nlvr2" / "BEST.msgpack"),
          "--output", str(world / "snap_nlvr2"), "--fp32"])
    csv = (world / "snap_nlvr2" / "nlvr2_valid_predict.csv").read_text()
    lines = [l for l in csv.splitlines() if l]
    assert len(lines) == 6
    assert all(l.split(",")[1] in ("True", "False") for l in lines)


def test_step7_pretrain_resume(world):
    """Resume-by-checkpoint-name (reference lxmert_pretrain.py:679-685)."""
    from xlxmert_tpu.cli.pretrain import main

    cpath = (world / "cluster_centroids" /
             "maskrcnn_mscoco_train_centroids10_iter3_d2048_grid2.npy")
    pkl = (world / "cluster_ids" /
           "maskrcnn_train_img_id_to_cluster_id_10_iter3_d2048"
           "_grid2.pkl")
    main(["--taskMaskLM", "--taskMatched", "--clustering", "--grid_model",
          "--grid_size", str(GRID), "--num_clusters", "10",
          "--epochs", "2", "--batchSize", "8",
          "--train", "mscoco_train", "--valid", "mscoco_minival",
          "--data_root", str(world), "--vocab", str(world / "vocab.txt"),
          "--centroid_path", str(cpath), "--cluster_pkl", str(pkl),
          "--model_config", str(world / "model.yaml"),
          "--output", str(world / "snap_resume"), "--fp32",
          "--load", str(world / "snap_pretrain" / "Epoch01_LXRT.msgpack")])
    # started at epoch 1, ran one more epoch -> Epoch02 written
    assert (world / "snap_resume" / "Epoch02_LXRT.msgpack").exists()


def test_step5c_sample_images_int8(world):
    """--int8: NAR decode loop through the static int8 serving engine."""
    from xlxmert_tpu.cli.sample_images import main

    cpath = (world / "cluster_centroids" /
             "maskrcnn_mscoco_train_centroids10_iter3_d2048_grid2.npy")
    main(["--load", str(world / "snap_pretrain" / "Epoch01_LXRT.msgpack"),
          "--centroids", str(cpath),
          "--vocab", str(world / "vocab.txt"),
          "--sentences", str(world / "sentences.txt"),
          "--model_config", str(world / "model.yaml"),
          "--grid_size", str(GRID), "--sample_steps", "2",
          "--batch_size", "2", "--int8",
          "--output", str(world / "samples_int8")])
    codes = sorted((world / "samples_int8").glob("codes_*.npy"))
    assert codes, "no code grids written"
    arr = np.load(codes[0])
    assert arr.shape == (2, GRID * GRID)
    assert (arr >= 0).all() and (arr < 10).all()
