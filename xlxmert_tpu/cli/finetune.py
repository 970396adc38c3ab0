"""Finetune/eval/test CLI shared by VQA, GQA, NLVR2 (reference
tasks/{vqa,gqa,nlvr2}.py __main__ + Trainer loops).

python -m xlxmert_tpu.cli.vqa   --train train,nominival --valid minival ...
python -m xlxmert_tpu.cli.gqa   --train train,valid --valid testdev ...
python -m xlxmert_tpu.cli.nlvr2 --train train --valid valid ...
"""
from __future__ import annotations

import time
from pathlib import Path

import numpy as np


def run(task: str, argv=None):
    from xlxmert_tpu.cli.args import base_parser, to_finetune_config

    p = base_parser()
    p.set_defaults(train="train,nominival", valid="minival", lr=5e-5,
                   epochs=10, batch_size=32)
    ns = p.parse_args(argv)
    cfg = to_finetune_config(ns, task)

    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.parallel.mesh import maybe_initialize_multihost

    maybe_initialize_multihost()

    from xlxmert_tpu.core.config import apply_rng_impl

    apply_rng_impl(cfg)

    from xlxmert_tpu.models.lxmert import train_attention_mode

    # training-path attention impl (trace-time module flag)
    train_attention_mode(ns.train_attention)

    from xlxmert_tpu.core.checkpoint import load_any_checkpoint, save_pytree
    from xlxmert_tpu.core.metrics import LossMeter, RunLogger
    from xlxmert_tpu.data.answer_table import AnswerTable
    from xlxmert_tpu.data.datasets import GQADataset, NLVR2Dataset, VQADataset
    from xlxmert_tpu.data.io import PrefetchLoader
    from xlxmert_tpu.data.fast_tokenizer import FastTokenizer as Tokenizer
    from xlxmert_tpu.tasks.finetune import FinetuneEngine

    is_main = jax.process_index() == 0
    logger = RunLogger(cfg.output, cfg, enabled=is_main)
    tokenizer = Tokenizer(ns.vocab)
    root = Path(ns.data_root)

    ds_cls = {"vqa": VQADataset, "gqa": GQADataset,
              "nlvr2": NLVR2Dataset}[task]
    kw = dict(max_text_length=cfg.max_text_length, grid_size=cfg.grid_size)
    test_mode = cfg.test is not None or cfg.test_only

    if test_mode:
        eval_ds = ds_cls.from_files(root, cfg.test or cfg.valid, tokenizer,
                                    encoder=cfg.encoder,
                                    topk=cfg.valid_topk, **kw)
        train_ds = None
    else:
        train_ds = ds_cls.from_files(root, cfg.train, tokenizer,
                                     encoder=cfg.encoder,
                                     topk=cfg.train_topk, **kw)
        train_ds.shard(jax.process_index(), jax.process_count())
        eval_ds = ds_cls.from_files(root, cfg.valid, tokenizer,
                                    encoder=cfg.encoder,
                                    topk=cfg.valid_topk, **kw)

    num_answers = (2 if task == "nlvr2"
                   else (train_ds or eval_ds).num_answers)
    label2ans = None if task == "nlvr2" else (train_ds or eval_ds).label2ans

    from xlxmert_tpu.cli.args import make_model_config

    steps_per_epoch = max((len(train_ds) if train_ds else 0)
                          // cfg.batch_size, 1)
    eng = FinetuneEngine(cfg, num_answers,
                         model_cfg=make_model_config(ns),
                         total_steps=max(steps_per_epoch * cfg.epochs, 1))
    state = eng.create_state(jax.random.PRNGKey(cfg.seed))

    # checkpoint loading (vqa.py:53-62 + QA-head surgery)
    if cfg.load:
        params = load_any_checkpoint(cfg.load)
        merged, _ = eng.load_pretrained(
            jax.tree.map(np.asarray, state.params), params)
        state = state.replace(params=jax.device_put(
            jax.tree.map(jnp.asarray, merged)))
    elif cfg.load_lxmert_qa:
        pre = load_any_checkpoint(cfg.load_lxmert_qa)
        table = AnswerTable(root / "lxmert" / "all_ans.json")
        merged, counts = eng.load_pretrained(
            jax.tree.map(np.asarray, state.params), pre,
            label2ans=label2ans, answer_table=table)
        logger.info(f"QA surgery: loaded {counts[0]}, zeroed {counts[1]}")
        state = state.replace(params=jax.device_put(
            jax.tree.map(jnp.asarray, merged)))
    elif cfg.load_lxmert:
        pre = load_any_checkpoint(cfg.load_lxmert)
        merged, _ = eng.load_pretrained(
            jax.tree.map(np.asarray, state.params), pre)
        state = state.replace(params=jax.device_put(
            jax.tree.map(jnp.asarray, merged)))

    def evaluate(params, dump_path=None):
        batches = eval_ds.batches(cfg.batch_size, test=test_mode)
        if jax.process_count() > 1:
            # per-process DDP-eval equivalent (vqa.py:259-295): each
            # process predicts its round-robin slice of the batch
            # stream; FinetuneEngine.predict merges the shard dumps
            # through shard_dir so every process returns the full dict
            pid, nproc = jax.process_index(), jax.process_count()
            batches = (b for i, b in enumerate(batches)
                       if i % nproc == pid)
            quesid2ans = eng.predict(
                params, batches, label2ans, int8=cfg.serve_int8,
                shard_dir=str(Path(cfg.output) / "eval_shards"))
        else:
            quesid2ans = eng.predict(params, batches, label2ans,
                                     int8=cfg.serve_int8)
        if dump_path:
            eval_ds.evaluator.dump_result(quesid2ans, dump_path)
            logger.info(f"dumped predictions to {dump_path}")
            return None
        return eval_ds.evaluator.evaluate(quesid2ans)

    if test_mode:
        out = str(Path(cfg.output) / f"{task}_{cfg.test or cfg.valid}_predict"
                  f"{'.csv' if task == 'nlvr2' else '.json'}")
        evaluate(state.params, dump_path=out)
        logger.close()
        return

    rng = jax.random.PRNGKey(cfg.seed)
    best = -1.0
    step_fn = eng.train_step()
    for epoch in range(cfg.epochs):
        t0 = time.time()
        meter = LossMeter()
        loader = PrefetchLoader(
            lambda: train_ds.batches(cfg.batch_size, shuffle=True,
                                     seed=cfg.seed + epoch,
                                     drop_last=True))
        for i, batch in enumerate(loader):
            batch.pop("question_ids")
            batch.pop("n_valid")
            if cfg.update_freq > 1:
                from xlxmert_tpu.tasks.finetune import should_update
                state, metrics = step_fn(
                    state, eng.place(batch), rng,
                    jnp.asarray(should_update(i, steps_per_epoch,
                                              cfg.update_freq)))
            else:
                state, metrics = step_fn(state, eng.place(batch), rng)
            if is_main and i % 50 == 0:
                meter.update(float(np.asarray(metrics["loss"])))
        # single- AND multi-process: evaluate() shards the batch stream
        # per process and merges shard dumps (tasks/finetune.predict
        # multi-host path), so BEST tracking works in both worlds
        score = evaluate(state.params)
        logger.info(f"epoch {epoch}: valid {score:.4f} loss {meter.val:.4f} "
                    f"({time.time() - t0:.0f}s)")
        logger.scalars((epoch + 1) * steps_per_epoch,
                       {"valid/score": score, "train/loss": meter.val})
        if is_main:
            params_np = jax.tree.map(np.asarray, state.params)
            save_pytree(params_np, str(Path(cfg.output) / "LAST.msgpack"))
            if score > best:
                best = score
                save_pytree(params_np, str(Path(cfg.output) / "BEST.msgpack"))
    logger.info(f"best valid: {best:.4f}")
    logger.close()
