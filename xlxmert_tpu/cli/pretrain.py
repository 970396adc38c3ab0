"""Pretraining CLI — the `bash scripts/pretrain.bash` equivalent
(reference lxmert_pretrain.py:688-867).

python -m xlxmert_tpu.cli.pretrain --taskMaskLM --taskObjPredict \
    --taskMatched --visualLosses obj --vis_mask_predict --clustering \
    --grid_model --grid_size 8 --llayers 9 --rlayers 5 --xlayers 5 \
    --lr 1e-4 --epochs 20 --batchSize 256 --train mscoco_train,... \
    --data_root data --vocab data/vocab.txt

Replaces mp.spawn/DDP with one SPMD program; masking happens on device.
"""
from __future__ import annotations

import time
from pathlib import Path

import numpy as np


def main(argv=None):
    from xlxmert_tpu.cli.args import base_parser, to_train_config

    ns = base_parser().parse_args(argv)
    cfg = to_train_config(ns)
    if "attr" in cfg.visual_loss_keys:
        # no loader emits attr labels: the reference's data_out never
        # includes 'attr_prob', so its attr loss is unreachable from
        # main_worker too (lxmert_pretrain.py:723-741 vs
        # lxmert_data.py:632-634). The out_attr head stays available to
        # API callers that supply batch['attr_label'] themselves.
        raise SystemExit(
            "--visualLosses attr: no pretraining data path provides "
            "attr labels (true of the reference as well); drop 'attr' "
            "or drive PretrainEngine directly with attr_label batches")
    if ("feat" in cfg.visual_loss_keys and cfg.clustering
            and not (cfg.feed_exact_feat or cfg.target_exact_feat)):
        # without an exact-feature source the engine computes no feat
        # loss (_task_heads skips it) — fail loudly instead of silently
        # dropping a requested loss (the reference would KeyError on
        # batch['vis_feats'] here, lxmert_pretrain.py:178)
        raise SystemExit(
            "--visualLosses feat in clustering mode needs an exact-"
            "feature source: add --feed_exact_feat and/or "
            "--target_exact_feat (otherwise no vis_feats are loaded "
            "and the feat loss would silently vanish)")
    if not cfg.clustering and not (cfg.feed_exact_feat
                                   or cfg.target_exact_feat):
        # the reference only loads bbox-h5 features under these flags
        # (lxmert_pretrain.py:733, lxmert_data.py:185) and the
        # non-clustering model input IS those features
        raise SystemExit(
            "non-clustering pretraining needs --feed_exact_feat and/or "
            "--target_exact_feat (exact detector features are the "
            "visual input on this path)")

    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.parallel.mesh import maybe_initialize_multihost

    maybe_initialize_multihost()

    from xlxmert_tpu.core.config import apply_rng_impl

    apply_rng_impl(cfg)

    from xlxmert_tpu.models.lxmert import train_attention_mode

    # training-path attention impl — must be set before the engine
    # traces its train steps (module-level flag, read at trace time)
    train_attention_mode(ns.train_attention)

    from xlxmert_tpu.core.checkpoint import (
        AsyncCheckpointer, epoch_ckpt_name, load_any_checkpoint,
        parse_start_epoch,
    )
    from xlxmert_tpu.core.metrics import LossMeter, RunLogger
    from xlxmert_tpu.data.datasets import PretrainDataset
    from xlxmert_tpu.data.io import ClusterMap, PrefetchLoader, load_json
    from xlxmert_tpu.data.fast_tokenizer import FastTokenizer as Tokenizer
    from xlxmert_tpu.tasks.pretrain import PretrainEngine
    from xlxmert_tpu.vocab.kmeans import centroid_filename

    is_main = jax.process_index() == 0
    logger = RunLogger(cfg.output, cfg, enabled=is_main)
    logger.info(f"devices: {jax.devices()}")

    from xlxmert_tpu.cli.args import make_model_config

    model_cfg = make_model_config(
        ns, num_clusters=cfg.num_clusters if cfg.clustering else 0)

    tokenizer = Tokenizer(ns.vocab)
    root = Path(ns.data_root)

    clusters = None
    bbox_readers = None
    feat_readers = None
    if cfg.clustering:
        # centroids (lxmert_pretrain.py:70-77 path convention)
        centroid_path = ns.centroid_path or root / "cluster_centroids" / \
            centroid_filename(cfg.encoder, cfg.cluster_src, cfg.num_clusters,
                              cfg.kmeans_iterations, cfg.feat_dim,
                              cfg.grid_size)
        centroids = jnp.asarray(np.load(centroid_path))

        cluster_pkl = ns.cluster_pkl or root / "cluster_ids" / \
            f"{cfg.encoder}_train_img_id_to_cluster_id_{cfg.num_clusters}" \
            f"_iter{cfg.kmeans_iterations}_d{cfg.feat_dim}" \
            f"_grid{cfg.grid_size}.pkl"
        clusters = ClusterMap(cluster_pkl)
    else:
        centroids = jnp.zeros((1, cfg.feat_dim))  # unused placeholder

    # exact-feature h5 routing: the reference keys the file family on
    # grid_model, independent of clustering (lxmert_data.py:186-201) —
    # grid h5 when grid_model (visual input on the non-clustering grid
    # path; feat-loss targets under clustering), boxes h5 otherwise.
    sources = set(cfg.train.split(",")) | set(cfg.valid.split(","))
    need_exact = cfg.feed_exact_feat or cfg.target_exact_feat
    if not cfg.grid_model:
        # bbox path; --bbox_h5 overrides all sources
        from xlxmert_tpu.data.io import BboxFeatureReader

        default_routes = {
            "mscoco_train": root / "mscoco_imgfeat"
            / f"maskrcnn_train_boxes{cfg.n_boxes}.h5",
            "mscoco_minival": root / "mscoco_imgfeat"
            / f"maskrcnn_valid_boxes{cfg.n_boxes}.h5",
            "mscoco_nominival": root / "mscoco_imgfeat"
            / f"maskrcnn_valid_boxes{cfg.n_boxes}.h5",
            "vgnococo": root / "vg_imgfeat"
            / f"maskrcnn_boxes{cfg.n_boxes}.h5",
        }
        readers_by_path = {}
        bbox_readers = {}
        for source in sources:
            path = Path(ns.bbox_h5) if ns.bbox_h5 else default_routes.get(
                source)
            if path is None:
                raise ValueError(
                    f"no bbox h5 route for source {source!r}; pass "
                    "--bbox_h5 or use a known source name")
            if str(path) not in readers_by_path:
                readers_by_path[str(path)] = BboxFeatureReader(path)
            bbox_readers[source] = readers_by_path[str(path)]
    elif need_exact:
        # grid h5 per source (lxmert_data.py:186-193 naming);
        # --grid_h5 overrides all sources
        from xlxmert_tpu.data.io import GridFeatureReader

        default_routes = {
            "mscoco_train": root / "mscoco_imgfeat"
            / f"{cfg.encoder}_train_grid{cfg.grid_size}.h5",
            "mscoco_minival": root / "mscoco_imgfeat"
            / f"{cfg.encoder}_valid_grid{cfg.grid_size}.h5",
            "mscoco_nominival": root / "mscoco_imgfeat"
            / f"{cfg.encoder}_valid_grid{cfg.grid_size}.h5",
            "vgnococo": root / "vg_imgfeat"
            / f"{cfg.encoder}_grid{cfg.grid_size}.h5",
        }
        readers_by_path = {}
        feat_readers = {}
        for source in sources:
            path = Path(ns.grid_h5) if ns.grid_h5 else default_routes.get(
                source)
            if path is None:
                raise ValueError(
                    f"no grid h5 route for source {source!r}; pass "
                    "--grid_h5 or use a known source name")
            if str(path) not in readers_by_path:
                readers_by_path[str(path)] = GridFeatureReader(path)
            feat_readers[source] = readers_by_path[str(path)]

    answer_table = None
    if cfg.task_qa:
        from xlxmert_tpu.data.answer_table import AnswerTable

        answer_table = AnswerTable(root / "lxmert" / "all_ans.json")
    vis_mask_sources = None
    if cfg.vis_mask_COCO_only:
        vis_mask_sources = {"mscoco"}
    elif cfg.vis_mask_COCOVG_only:
        vis_mask_sources = {"mscoco", "vg"}

    ds_kw = dict(max_text_length=cfg.max_text_length,
                 grid_size=cfg.grid_size, answer_table=answer_table,
                 vis_mask_sources=vis_mask_sources)
    def load_corpus(sources: str):
        out = []
        for source in sources.split(","):
            data = load_json(root / "lxmert" / f"{source}.json")
            for datum in data:
                # bbox-path h5 routing is per corpus source
                # (lxmert_pretrain.py:196-201 + img_ids_to_source)
                datum.setdefault("img_source", source)
            out.extend(data)
        return out

    train_ds = PretrainDataset(load_corpus(cfg.train), tokenizer, clusters,
                               bbox_readers=bbox_readers,
                               feat_reader=feat_readers,
                               topk=cfg.train_topk, **ds_kw)
    train_ds.shard(jax.process_index(), jax.process_count())

    valid_ds = PretrainDataset(load_corpus(cfg.valid), tokenizer, clusters,
                               bbox_readers=bbox_readers,
                               feat_reader=feat_readers,
                               topk=cfg.valid_topk, **ds_kw)

    steps_per_epoch = max(len(train_ds) // cfg.batch_size, 1)
    total_steps = steps_per_epoch * cfg.epochs
    eng = PretrainEngine(cfg, model_cfg=model_cfg, total_steps=total_steps)
    logger.info(f"{len(train_ds)} examples, {steps_per_epoch} steps/epoch, "
                f"tasks {cfg.mask_modalities}")

    state = eng.create_state(jax.random.PRNGKey(cfg.seed))
    start_epoch = 0
    # BERT-pretrained init (the reference default, lxmert_pretrain.py:58-61;
    # --fromScratch is the documented opt-out, param.py:90-93). Applied
    # before any --load resume so a full checkpoint overlay wins.
    if cfg.from_scratch:
        if cfg.bert_weights:
            logger.info("--fromScratch set: ignoring --bert_weights "
                        f"{cfg.bert_weights}")
    elif cfg.bert_weights:
        from xlxmert_tpu.core.checkpoint import merge_params
        from xlxmert_tpu.core.convert import load_bert_state_dict

        bert_tree = load_bert_state_dict(cfg.bert_weights,
                                         l_layers=model_cfg.l_layers)
        merged, missing, unexpected = merge_params(
            jax.tree.map(np.asarray, state.params), bert_tree)
        if unexpected:
            raise ValueError(
                f"--bert_weights produced unexpected param paths "
                f"(wrong checkpoint?): {unexpected[:5]}...")
        state = state.replace(params=jax.device_put(
            jax.tree.map(jnp.asarray, merged), state.params[
                "bert"]["pooler"]["dense"]["kernel"].sharding))
        logger.info(f"BERT init from {cfg.bert_weights}: language stack + "
                    f"embeddings + LM/matched heads loaded; "
                    f"{len(missing)} param paths stay random-init")
    elif not cfg.load:
        logger.info(
            "WARNING: no --bert_weights given and --fromScratch not set — "
            "the reference default initializes from bert-base-uncased "
            "(lxmert_pretrain.py:58-61); proceeding from scratch. Pass "
            "--bert_weights pytorch_model.bin or --fromScratch to silence.")
    if cfg.load:
        from xlxmert_tpu.core.checkpoint import (
            is_full_state_tree, merge_params, restore_train_state)

        loaded = load_any_checkpoint(cfg.load, keep_full_state=True)
        if is_full_state_tree(loaded):
            # exact resume: optimizer moments + LR-schedule position
            state, saved_total = restore_train_state(state, loaded)
            start_epoch = parse_start_epoch(cfg.load)
            if saved_total is not None and saved_total != total_steps:
                logger.info(
                    f"WARNING: LR-schedule horizon changed: checkpoint "
                    f"was saved with total_steps={saved_total}, this run "
                    f"computes {total_steps} (epochs/batch/data changed) "
                    f"— continuing is fine, but the continuation is NOT "
                    f"bit-identical to an uninterrupted run")
            logger.info(f"exact-resumed full train state from {cfg.load} "
                        f"at epoch {start_epoch}, "
                        f"step {int(np.asarray(state.step))}")
        else:
            merged, missing, unexpected = merge_params(
                jax.tree.map(np.asarray, state.params), loaded)
            if missing or unexpected:
                logger.info(f"checkpoint overlay (strict=False): "
                            f"{len(missing)} missing, {len(unexpected)} "
                            f"unexpected param paths")
            state = state.replace(params=jax.device_put(
                jax.tree.map(jnp.asarray, merged), state.params[
                    "bert"]["pooler"]["dense"]["kernel"].sharding))
            start_epoch = parse_start_epoch(cfg.load)
            logger.info(f"resumed from {cfg.load} at epoch {start_epoch}")

    rng = jax.random.PRNGKey(cfg.seed)
    meters = {}
    global_step = start_epoch * steps_per_epoch
    ckpt = AsyncCheckpointer()  # epoch saves overlap the next epoch

    profile_n = getattr(ns, "profile", 0)
    # after compile + warmup, clamped so short epochs still trace
    profile_start = (min(5, max(steps_per_epoch - profile_n, 0))
                     if not cfg.dry else -1)
    profiling = False
    try:
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            loader = PrefetchLoader(
                lambda: train_ds.batches(cfg.batch_size, shuffle=True,
                                         seed=cfg.seed + epoch,
                                         drop_last=True))
            if not cfg.dry:
                for i, batch in enumerate(loader):
                    if profile_n and epoch == start_epoch and is_main:
                        if i == profile_start:
                            jax.profiler.start_trace(
                                str(Path(cfg.output) / "profile"))
                            profiling = True
                        elif profiling and i == profile_start + profile_n:
                            jax.profiler.stop_trace()
                            profiling = False
                            logger.info(f"profiler trace of {profile_n} "
                                        f"steps -> {cfg.output}/profile")
                    batch.pop("uids", None)
                    batch.pop("n_valid", None)
                    task = eng.task_for_step(global_step)
                    state, metrics = eng.train_step(task)(
                        state, eng.place(batch), rng, centroids)
                    if is_main and (i % 50 == 0):
                        loss = float(np.asarray(metrics["total_loss"]))
                        meters.setdefault(task, LossMeter()).update(loss)
                        logger.scalars(global_step, {
                            f"{task}/loss": loss,
                            "grad_norm": float(np.asarray(metrics["grad_norm"]))})
                    global_step += 1
                if profiling:  # epoch shorter than the trace window
                    jax.profiler.stop_trace()
                    profiling = False

            # eval epoch (lxmert_pretrain.py:553-673)
            eval_metrics = {}
            for i, batch in enumerate(valid_ds.batches(cfg.batch_size)):
                batch.pop("uids", None)
                batch.pop("n_valid", None)
                for task in cfg.mask_modalities:
                    # distinct mask draw per eval batch — one shared key
                    # would mask identical positions in every batch
                    m = eng.eval_step(task)(
                        state.params, eng.place(batch),
                        jax.random.fold_in(jax.random.PRNGKey(epoch), i),
                        centroids)
                    eval_metrics.setdefault(task, LossMeter()).update(
                        float(np.asarray(m["total_loss"])))
            if is_main:
                summary = {f"valid/{t}": m.val for t, m in eval_metrics.items()}
                logger.scalars(global_step, summary)
                logger.info(f"epoch {epoch}: {summary} "
                            f"({time.time() - t0:.0f}s)")
                if cfg.save_full_state:
                    from xlxmert_tpu.core.checkpoint import train_state_to_tree

                    # one host snapshot -> both files (FULL + params alias)
                    ckpt.save_full(
                        train_state_to_tree(state, total_steps=total_steps),
                        str(Path(cfg.output)
                            / f"Epoch{epoch + 1:02d}_FULL.msgpack"),
                        str(Path(cfg.output) / epoch_ckpt_name(epoch + 1)))
                else:
                    ckpt.save(state.params,
                              str(Path(cfg.output) / epoch_ckpt_name(epoch + 1)))
    finally:
        if profiling:  # epoch shorter than the requested trace window
            jax.profiler.stop_trace()
        # queued async save survives exceptions/KeyboardInterrupt —
        # without this the daemon writer dies mid-write and the
        # epoch's checkpoint is silently lost
        ckpt.wait()
    logger.close()


if __name__ == "__main__":
    main()
