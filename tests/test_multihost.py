"""Multi-host input-path tests (single-process simulation).

The reference shards data per rank with DistributedSampler
(x-lxmert/src/pretrain/lxmert_data.py:663-667); the TPU-native equivalent
is dataset.shard(process_index, process_count) on the host plus
jax.make_array_from_process_local_data to assemble the global batch from
per-process slices (parallel/mesh.py shard_batch process_local path).

True multi-process execution needs a pod; here we validate the contract
pieces that CAN be checked single-process:
  - the process_local assembly path produces the same global array (and
    sharding) as the device_put path when process_count == 1,
  - per-host slices reassemble into exactly the global batch,
  - dataset.shard covers the corpus disjointly across ranks,
  - a train step consumes a process_local-assembled batch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from xlxmert_tpu.parallel.mesh import (data_sharding, make_mesh, shard_batch)


def global_batch(seed=0, B=16):
    rng = np.random.RandomState(seed)
    return {
        "ids": rng.randint(0, 100, (B, 12)).astype(np.int32),
        "feats": rng.randn(B, 4, 8).astype(np.float32),
    }


def test_process_local_path_matches_device_put_single_process():
    assert jax.process_count() == 1
    mesh = make_mesh()
    batch = global_batch()
    via_put = shard_batch(batch, mesh, process_local=False)
    via_local = shard_batch(batch, mesh, process_local=True)
    for k in batch:
        assert via_local[k].shape == via_put[k].shape
        assert via_local[k].sharding.is_equivalent_to(
            via_put[k].sharding, via_put[k].ndim)
        np.testing.assert_array_equal(np.asarray(via_local[k]),
                                      np.asarray(via_put[k]))


def test_per_host_slices_reassemble_global_batch():
    """Simulate the per-host contract: slice the global batch the way P
    sharded hosts would, place each slice on that host's devices, and
    check the assembled global array equals the global batch.

    With one real process we can't call make_array_from_process_local_data
    per fake host, but we CAN verify its addressing contract: the rows a
    host must provide are exactly the rows its addressable shards own.
    """
    mesh = make_mesh()
    sh = data_sharding(mesh)
    batch = global_batch()
    n_fake_hosts = 4
    B = batch["ids"].shape[0]
    arr = jax.device_put(batch["ids"], sh)

    # device_put of per-host slices onto per-host device groups, then
    # reading the addressable shards back, must tile the global array.
    reassembled = np.zeros_like(batch["ids"])
    per_host = B // n_fake_hosts
    devs = mesh.devices.reshape(-1)
    devs_per_host = len(devs) // n_fake_hosts
    for h in range(n_fake_hosts):
        local = batch["ids"][h * per_host:(h + 1) * per_host]
        host_devices = devs[h * devs_per_host:(h + 1) * devs_per_host]
        host_mesh = make_mesh((len(host_devices),), ("data",),
                              devices=list(host_devices))
        local_arr = jax.device_put(local, data_sharding(host_mesh))
        for s in local_arr.addressable_shards:
            offset = h * per_host + (s.index[0].start or 0)
            reassembled[offset:offset + s.data.shape[0]] = np.asarray(s.data)
    # global-array shards carry the same data at the same offsets
    for s in arr.addressable_shards:
        np.testing.assert_array_equal(
            np.asarray(s.data), reassembled[s.index[0]])


def test_process_local_divisibility_error():
    mesh = make_mesh()
    bad = {"x": np.zeros((9, 3), np.float32)}  # 9 rows on 8 local devices
    with pytest.raises(ValueError, match="divisible"):
        shard_batch(bad, mesh, process_local=True)


def test_dataset_shard_is_disjoint_cover():
    from xlxmert_tpu.data.datasets import VQADataset
    from xlxmert_tpu.data.tokenization import Tokenizer

    data = [{"question": f"q {i}", "img_id": f"i{i}", "label": {},
             "question_id": i} for i in range(23)]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "q"] + \
        [str(i) for i in range(10)]
    tok = Tokenizer({t: i for i, t in enumerate(vocab)})
    world = 4
    seen = []
    for rank in range(world):
        ds = VQADataset(list(data), tok, feat_reader=None, ans2label={},
                        label2ans=[], max_text_length=8, grid_size=2)
        ds.shard(rank, world)
        seen.extend(d["question_id"] for d in ds.data)
    assert sorted(seen) == list(range(23))  # disjoint cover, no dupes


def test_train_step_consumes_process_local_batch():
    from tests.test_pretrain_engine import TINY, make_batch
    from xlxmert_tpu.core.config import TrainConfig
    from xlxmert_tpu.tasks.pretrain import PretrainEngine

    cfg = TrainConfig(batch_size=16, grid_size=4, num_clusters=24,
                      max_text_length=12, mixed_precision=False, lr=1e-3)
    eng = PretrainEngine(cfg, model_cfg=TINY, total_steps=10)
    state = eng.create_state(jax.random.PRNGKey(0))
    centroids = jnp.asarray(
        np.random.RandomState(1).randn(24, 16).astype(np.float32))
    batch = shard_batch(make_batch(cfg), eng.mesh, process_local=True)
    state, metrics = eng.train_step("word_mask")(
        state, batch, jax.random.PRNGKey(7), centroids)
    assert np.isfinite(float(metrics["total_loss"]))


def test_maybe_initialize_multihost_gating(monkeypatch):
    """Local runs (no cluster env) must NOT touch jax.distributed;
    cluster env vars trigger it; explicit-arg failures raise instead of
    silently degrading to N duplicate single-process jobs."""
    import pytest

    from xlxmert_tpu.parallel import mesh as mesh_mod

    calls = []

    class FakeDistributed:
        def initialize(self, *a):
            calls.append(a)
            if a and a[0] == "badhost:1":
                raise RuntimeError("unreachable coordinator")

    monkeypatch.setattr(jax, "distributed", FakeDistributed())
    for v in mesh_mod._CLUSTER_ENV_VARS:
        monkeypatch.delenv(v, raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)

    mesh_mod.maybe_initialize_multihost()
    assert calls == []  # local: untouched

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "h:1234")
    mesh_mod.maybe_initialize_multihost()
    assert calls == [()]  # auto-discovery path

    with pytest.raises(RuntimeError, match="unreachable"):
        mesh_mod.initialize_multihost("badhost:1", 4, 0)
