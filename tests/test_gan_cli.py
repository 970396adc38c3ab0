"""train_generator CLI end-to-end on tiny synthetic images + clusters."""
import pickle

import numpy as np
import pytest


def test_train_generator_cli(tmp_path):
    from PIL import Image

    from xlxmert_tpu.cli.train_generator import main

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    n_grid, emb_dim, n_classes = 2, 16, 7
    cluster_map = {}
    for i in range(16):
        name = f"im{i:02d}"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"{name}.jpg")
        cluster_map[name] = rng.randint(0, n_classes,
                                        (n_grid * n_grid,)).astype(np.int64)
    centroids = (rng.randn(n_classes, emb_dim) * 0.2).astype(np.float32)
    np.save(tmp_path / "centroids.npy", centroids)
    with open(tmp_path / "clusters.pkl", "wb") as f:
        pickle.dump(cluster_map, f)

    main(["--images_dir", str(img_dir),
          "--centroids", str(tmp_path / "centroids.npy"),
          "--cluster_pkl", str(tmp_path / "clusters.pkl"),
          "--output", str(tmp_path / "snap_g"),
          "--epochs", "1", "--batch_size", "8",
          "--g_base_dim", "8", "--d_base_dim", "8",
          "--codebook_dim", "8", "--emb_dim", str(emb_dim),
          "--n_grid", str(n_grid), "--resize_target_size", "16",
          "--fp32"])
    assert (tmp_path / "snap_g" / "G_0.msgpack").exists()
    assert (tmp_path / "snap_g" / "log.txt").exists()
    scalars = (tmp_path / "snap_g" / "scalars.jsonl").read_text()
    assert "g_total" in scalars and "d_total" in scalars


def test_train_generator_full_state_resume(tmp_path):
    """--save_full_state + --resume: D, SN vectors, and both optimizer
    states survive (the reference cannot resume GAN training at all —
    only G is checkpointed and its trainer.py is missing upstream).
    Engine-level bit-equality is pinned in test_checkpoint.py."""
    from PIL import Image

    from xlxmert_tpu.cli.train_generator import main

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    n_grid, emb_dim, n_classes = 2, 16, 7
    cluster_map = {}
    for i in range(16):
        name = f"im{i:02d}"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"{name}.jpg")
        cluster_map[name] = rng.randint(0, n_classes,
                                        (n_grid * n_grid,)).astype(np.int64)
    np.save(tmp_path / "centroids.npy",
            (rng.randn(n_classes, emb_dim) * 0.2).astype(np.float32))
    with open(tmp_path / "clusters.pkl", "wb") as f:
        pickle.dump(cluster_map, f)

    base = ["--images_dir", str(img_dir),
            "--centroids", str(tmp_path / "centroids.npy"),
            "--cluster_pkl", str(tmp_path / "clusters.pkl"),
            "--output", str(tmp_path / "snap_g"),
            "--batch_size", "8",
            "--g_base_dim", "8", "--d_base_dim", "8",
            "--codebook_dim", "8", "--emb_dim", str(emb_dim),
            "--n_grid", str(n_grid), "--resize_target_size", "16",
            "--fp32", "--save_full_state"]
    main(base + ["--epochs", "1"])
    full = tmp_path / "snap_g" / "G_0_FULL.msgpack"
    assert full.exists()
    main(base + ["--epochs", "2", "--resume", str(full)])
    assert (tmp_path / "snap_g" / "G_1.msgpack").exists()
    log = (tmp_path / "snap_g" / "log.txt").read_text()
    assert "exact-resumed GAN state" in log


def test_pretrain_dry_flag(tmp_path):
    """--dry: eval-only pass, no training, no crash
    (reference lxmert_pretrain.py:238-239)."""
    import json

    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.cli.pretrain import main

    rng = np.random.RandomState(0)
    (tmp_path / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                   "a", "dog", "runs"]) + "\n")
    cfg = LxmertConfig(vocab_size=8, hidden_size=16, num_attention_heads=2,
                       intermediate_size=32, l_layers=1, x_layers=1,
                       r_layers=1, visual_feat_dim=8, num_clusters=5)
    cfg.save(str(tmp_path / "model.yaml"))
    np.save(tmp_path / "centroids.npy",
            rng.randn(5, 8).astype(np.float32))
    clusters = {f"i{k}": rng.randint(0, 5, (4,)).astype(np.int64)
                for k in range(8)}
    with open(tmp_path / "clusters.pkl", "wb") as f:
        pickle.dump(clusters, f)
    (tmp_path / "lxmert").mkdir()
    corpus = [{"img_id": f"i{k}", "sentf": {"mscoco": ["a dog runs"]}}
              for k in range(8)]
    (tmp_path / "lxmert" / "c.json").write_text(json.dumps(corpus))

    main(["--taskMaskLM", "--taskMatched", "--clustering", "--grid_model",
          "--grid_size", "2", "--num_clusters", "5", "--epochs", "1",
          "--batchSize", "8", "--train", "c", "--valid", "c",
          "--data_root", str(tmp_path), "--vocab", str(tmp_path / "vocab.txt"),
          "--centroid_path", str(tmp_path / "centroids.npy"),
          "--cluster_pkl", str(tmp_path / "clusters.pkl"),
          "--model_config", str(tmp_path / "model.yaml"),
          "--output", str(tmp_path / "snap"), "--fp32", "--dry"])
    # eval scalars written, checkpoint still saved at epoch end
    assert (tmp_path / "snap" / "Epoch01_LXRT.msgpack").exists()
    scalars = (tmp_path / "snap" / "scalars.jsonl").read_text()
    assert "valid/word_mask" in scalars
