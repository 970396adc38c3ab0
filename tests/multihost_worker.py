"""Worker process for tests/test_multihost_real.py.

Runs as ONE process of an n-process jax.distributed CPU job (the
rebuild's equivalent of the reference's process-per-GPU world,
lxmert_pretrain.py:688-700,864-867): initializes the coordination
service, builds its per-process slice of the global batch exactly as a
sharded loader would, assembles global arrays via shard_batch's
make_array_from_process_local_data path, runs train steps, and (on
process 0) writes the global loss trajectory.

Usage: python multihost_worker.py <pid> <nproc> <port> <out.json>
Not a test module — invoked by subprocess only.
"""
import json
import os
import sys


def make_global_batch(step, B, L, V, vocab, n_clusters):
    import numpy as np

    r = np.random.RandomState(100 + step)
    word_id = r.randint(1, vocab, (B, L)).astype(np.int32)
    word_id[:, 0] = 1
    other = r.randint(1, vocab, (B, L)).astype(np.int32)
    other[:, 0] = 1
    return {
        "word_id": word_id,
        "other_word_id": other,
        "matched_label": r.randint(0, 2, (B,)).astype(np.int32),
        "cluster_id": r.randint(0, n_clusters, (B, V)).astype(np.int32),
    }


def predict_mode(pid, nproc, out_path):
    """Multi-host sharded predict + merge (VERDICT r4 #7): each process
    predicts over ITS round-robin slice of the eval batches through
    FinetuneEngine.predict's per-process path (process-local jit over
    re-placed replicated params), shards merge via shard_dir, and the
    merged dict must equal a single-process predict over the full
    stream — the reference's DDP eval contract (vqa.py:259-295:
    per-rank DistributedSampler loader + merge for scoring)."""
    import json

    import jax
    import numpy as np

    from xlxmert_tpu.core.config import FinetuneConfig, LxmertConfig
    from xlxmert_tpu.tasks.finetune import FinetuneEngine

    tiny = LxmertConfig(
        vocab_size=120, hidden_size=32, num_attention_heads=4,
        intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=16, num_qa_labels=5)
    cfg = FinetuneConfig(task="vqa", batch_size=4, grid_size=4,
                         max_text_length=10, mixed_precision=False)
    eng = FinetuneEngine(cfg, num_answers=5, model_cfg=tiny,
                         total_steps=10)
    state = eng.create_state(jax.random.PRNGKey(0))
    label2ans = [f"ans{i}" for i in range(5)]

    def make_batches():
        B, L, V = 4, cfg.max_text_length, cfg.n_grids
        out = []
        for s in range(5):  # 5 batches: uneven across 2 processes
            r = np.random.RandomState(300 + s)
            out.append({
                "word_ids": r.randint(1, 120, (B, L)).astype(np.int32),
                "vis_feats": r.randn(B, V, 16).astype(np.float32),
                "boxes": r.rand(B, V, 4).astype(np.float32),
                "question_ids": [1000 * s + i for i in range(B)],
                "n_valid": B,
            })
        return out

    shard_dir = os.path.join(os.path.dirname(out_path), "shards")
    if nproc > 1:
        mine = [b for i, b in enumerate(make_batches())
                if i % nproc == pid]
        quesid2ans = eng.predict(state.params, mine, label2ans,
                                 shard_dir=shard_dir)
    else:
        quesid2ans = eng.predict(state.params, make_batches(), label2ans)

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"quesid2ans": {str(k): v
                                      for k, v in quesid2ans.items()},
                       "n": len(quesid2ans),
                       "process_count": int(jax.process_count())}, f)


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "pretrain"
    local_devices = 4 // nproc  # 4 global CPU devices regardless of nproc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")

    import jax

    # the TPU boot shim (sitecustomize) forces jax_platforms; override
    # AFTER import, like tests/conftest.py
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4

    if mode == "predict":
        return predict_mode(pid, nproc, out_path)

    import numpy as np

    from xlxmert_tpu.core.config import LxmertConfig, TrainConfig
    from xlxmert_tpu.tasks.pretrain import PretrainEngine

    B, L, G = 8, 6, 2
    V = G * G
    mcfg = LxmertConfig(
        vocab_size=53, hidden_size=32, num_attention_heads=4,
        intermediate_size=64, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=16, num_qa_labels=3, num_clusters=11,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    tcfg = TrainConfig(batch_size=B, max_text_length=L, grid_size=G,
                       feat_dim=16, num_clusters=11, clustering=True,
                       mixed_precision=False, task_qa=False)
    eng = PretrainEngine(tcfg, model_cfg=mcfg, total_steps=10)
    state = eng.create_state(jax.random.PRNGKey(0))

    centroids = jax.numpy.asarray(
        np.random.RandomState(9).randn(11, 16).astype(np.float32) * 0.3)
    rng = jax.random.PRNGKey(7)

    losses = []
    B_local = B // jax.process_count()
    for k in range(3):  # one full round-robin: vis_mask/word_mask/matched
        task = eng.task_for_step(k)
        gbatch = make_global_batch(k, B, L, V, 53, 11)
        # the per-process loader contract: each host passes only ITS
        # contiguous slice (dataset.shard semantics) and shard_batch
        # assembles the global array across processes
        local = {key: val[pid * B_local:(pid + 1) * B_local]
                 for key, val in gbatch.items()}
        placed = eng.place(local)
        state, metrics = eng.train_step(task)(state, placed, rng, centroids)
        # total_loss is a replicated global scalar: every process may
        # fetch it
        losses.append(float(np.asarray(metrics["total_loss"])))

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"losses": losses,
                       "process_count": int(jax.process_count())}, f)
    # all processes must stay alive until the slowest finishes its last
    # collective; exiting the script naturally is the barrier here


if __name__ == "__main__":
    main()
