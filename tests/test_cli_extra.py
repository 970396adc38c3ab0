"""Extra CLI coverage: GQA finetune/test path and the FID eval CLI."""
import json

import numpy as np
import pytest

from xlxmert_tpu.core.config import LxmertConfig

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "dog", "cat", "runs", "sits", "red"]
GRID = 2
V = GRID * GRID


@pytest.fixture(scope="module")
def gqa_world(tmp_path_factory):
    import h5py

    root = tmp_path_factory.mktemp("gqa_world")
    (root / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    cfg = LxmertConfig(vocab_size=len(VOCAB), hidden_size=32,
                       num_attention_heads=4, intermediate_size=64,
                       l_layers=1, x_layers=1, r_layers=1,
                       visual_feat_dim=16, num_qa_labels=3, num_clusters=0)
    cfg.save(str(root / "model.yaml"))

    rng = np.random.RandomState(0)
    img_ids = [f"g{i}" for i in range(8)]
    (root / "vg_gqa_imgfeat").mkdir()
    with h5py.File(root / "vg_gqa_imgfeat" / "maskrcnn_vg_gqa_grid2.h5",
                   "w") as f:
        for i in img_ids:
            f.create_group(i).create_dataset(
                "features", data=rng.randn(GRID, GRID, 16).astype(np.float32))

    (root / "gqa").mkdir()
    data = [{"question_id": f"q{q}", "img_id": img_ids[q % 8],
             "sent": "a dog runs", "label": {"dog": 1.0}} for q in range(16)]
    (root / "gqa" / "train.json").write_text(json.dumps(data))
    (root / "gqa" / "testdev.json").write_text(json.dumps(data[:8]))
    (root / "gqa" / "trainval_ans2label.json").write_text(
        json.dumps({"dog": 0, "cat": 1, "red": 2}))
    (root / "gqa" / "trainval_label2ans.json").write_text(
        json.dumps(["dog", "cat", "red"]))
    return root


def test_gqa_cli_train_and_submit(gqa_world):
    from xlxmert_tpu.cli.gqa import main

    root = gqa_world
    main(["--train", "train", "--valid", "testdev", "--epochs", "1",
          "--batchSize", "8", "--data_root", str(root),
          "--vocab", str(root / "vocab.txt"),
          "--model_config", str(root / "model.yaml"),
          "--grid_size", str(GRID),
          "--output", str(root / "snap_gqa"), "--fp32"])
    assert (root / "snap_gqa" / "BEST.msgpack").exists()

    main(["--test", "testdev", "--batchSize", "8",
          "--data_root", str(root), "--vocab", str(root / "vocab.txt"),
          "--model_config", str(root / "model.yaml"),
          "--grid_size", str(GRID),
          "--load", str(root / "snap_gqa" / "BEST.msgpack"),
          "--output", str(root / "snap_gqa"), "--fp32"])
    preds = json.loads(
        (root / "snap_gqa" / "gqa_testdev_predict.json").read_text())
    assert len(preds) == 8
    # GQA submission format: questionId is a string
    assert all(isinstance(p["questionId"], str) for p in preds)


def test_eval_fid_cli(tmp_path):
    from PIL import Image

    from xlxmert_tpu.cli.eval_fid import main

    rng = np.random.RandomState(0)
    for name, shift in (("real", 0), ("fake_close", 5), ("fake_far", 120)):
        d = tmp_path / name
        d.mkdir()
        for i in range(12):
            arr = np.clip(rng.randint(0, 130, (64, 64, 3)) + shift,
                          0, 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")

    close = main(["--real_dir", str(tmp_path / "real"),
                  "--fake_dir", str(tmp_path / "fake_close"),
                  "--image_size", "64", "--batch_size", "6"])
    far = main(["--real_dir", str(tmp_path / "real"),
                "--fake_dir", str(tmp_path / "fake_far"),
                "--image_size", "64", "--batch_size", "6"])
    assert np.isfinite(close) and np.isfinite(far)
    assert close < far  # closer distribution scores lower


def test_extract_features_maskrcnn_arch(tmp_path):
    """--arch maskrcnn: Detectron fc6 grid path writes the reference h5
    contract (coco_extract_grid_feature.py:256-260) in both size modes."""
    import h5py
    from PIL import Image

    from xlxmert_tpu.cli.extract_features import main as extract_main

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, (h, w) in enumerate([(48, 64), (64, 48), (36, 36)]):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            img_dir / f"im{i}.jpg")

    out = tmp_path / "maskrcnn_test_grid2.h5"
    extract_main(["--images_dir", str(img_dir), "--out", str(out),
                  "--arch", "maskrcnn", "--tiny_detectron",
                  "--grid_size", "2", "--image_size", "64",
                  "--batch_size", "2"])
    with h5py.File(out) as f:
        assert set(f.keys()) == {"im0", "im1", "im2"}
        feats = f["im0"]["features"][()]
        assert feats.shape == (2, 2, 24)  # tiny mlp_dim=24
        assert np.isfinite(feats).all()
        assert (feats >= 0).all()  # fc6 post-ReLU

    # reference min-800/max-1333 mode (image_size 0) on ONE small image
    solo = tmp_path / "solo"
    solo.mkdir()
    Image.fromarray(rng.randint(0, 255, (40, 52, 3), np.uint8)).save(
        solo / "one.jpg")
    out2 = tmp_path / "native.h5"
    extract_main(["--images_dir", str(solo), "--out", str(out2),
                  "--arch", "maskrcnn", "--tiny_detectron",
                  "--grid_size", "2", "--image_size", "0",
                  "--batch_size", "1"])
    with h5py.File(out2) as f:
        assert f["one"]["features"][()].shape == (2, 2, 24)
