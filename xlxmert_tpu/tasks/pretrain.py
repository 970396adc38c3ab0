"""Pretraining engine: unified jitted train/eval steps, task round-robin,
bf16 compute, 1-D data mesh with XLA-inserted gradient collectives.

Reference behavior being reproduced (lxmert_pretrain.py:45-686):
  - task = MASK_MODALITY[step % len(MASK_MODALITY)] round-robin (:295-298)
  - AdamW + linear warmup/decay, no-decay groups (:110-141)
  - grad clipping (:343-353), per-epoch eval + checkpoint (:486,549)

TPU-native re-design:
  - All masking/label construction that the reference does on the host in
    Dataset/collate runs on device inside the jitted step (ops/masking.py).
  - One jitted step per task (static task arg) replaces DDP's
    find_unused_parameters=True: every program only touches the params it
    uses; missing grads are zeros via a unified tree.
  - Metrics come back via the same SPMD program (mean over the global
    batch) — no dist.reduce / barriers (utils.py:11-39 equivalents).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from xlxmert_tpu.core.config import LxmertConfig, TrainConfig
from xlxmert_tpu.core.optim import make_optimizer
from xlxmert_tpu.models.xlxmert import (
    XLxmert, embed_clusters, get_word_embedding_matrix, pretrain_losses,
)
from xlxmert_tpu.ops.masking import (
    random_word_mask, square_vis_mask, uniform_count_vis_mask,
)
from xlxmert_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from xlxmert_tpu.utils.boxes import box_position


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)


def used_param_mask(params, task: str, cfg: TrainConfig):
    """Static per-task param-usage mask: which params torch autograd
    reaches for this task's total_loss (lxmert_pretrain.py:334-366 —
    loss.backward() then AdamW skips grad-None params). Fed to
    core/optim.reference_adamw so heads outside the task's subgraph get
    no momentum/weight-decay/step-count advance, exactly like the
    reference's round-robin. Leaves are python bools (computed from the
    path only), so each per-task jitted step prunes unused subtrees."""
    heads = _task_heads(task, cfg)
    # which output streams this task's loss consumes
    lang_used = ("lm" in heads or "matched" in heads
                 or task == "matched" or cfg.task_qa)
    visn_used = any(k in heads for k in ("obj", "feat", "attr"))
    try:
        x_names = [k for k in params["bert"]["encoder"]
                   if str(k).startswith("x_layers_")]
        _last_x_name = (max(x_names, key=lambda k: int(str(k).split("_")[-1]))
                        if x_names else None)
    except (KeyError, TypeError):
        _last_x_name = None

    def mark(path, _):
        names = [getattr(p, "key", str(p)) for p in path]
        top = names[0]
        if top == "bert":
            if "pooler" in names:
                # pooled output feeds only the matched + QA heads
                return task == "matched" or cfg.task_qa
            # the LAST x-layer's post-cross-attention tails feed only
            # their own stream (the shared cross-att reads the layer
            # INPUTS): a loss on the other stream leaves them grad-None
            # in torch (HF LxmertXLayer dataflow; verified against
            # autograd in tests/test_trainer_trajectory_parity.py)
            if _last_x_name and _last_x_name in names:
                if any(n in ("lang_self_att", "lang_inter", "lang_output")
                       for n in names):
                    return lang_used
                if any(n in ("visn_self_att", "visn_inter", "visn_output")
                       for n in names):
                    return visn_used
            return True
        if top == "cls":
            if "predictions" in names:
                return "lm" in heads
            return "matched" in heads  # seq_relationship
        if top == "obj_predict_head":
            return any(k in heads for k in ("obj", "feat", "attr"))
        if top == "mask_feat":
            return task == "vis_mask"
        if top == "answer_head":
            return "qa" in heads
        return True

    return jax.tree_util.tree_map_with_path(mark, params)


def _task_heads(task: str, cfg: TrainConfig) -> Tuple[str, ...]:
    heads = []
    if task == "word_mask":
        heads.append("lm")
    elif task == "matched":
        heads.append("matched")
    elif task == "vis_mask":
        for k in ("obj", "feat", "attr"):
            if k not in cfg.visual_loss_keys:
                continue
            # the obj loss needs a label source: cluster ids (clustering)
            # or detector ids (--target_obj_id); otherwise the reference
            # computes no obj loss (lxmert_pretrain.py:162-170)
            if k == "obj" and not (cfg.clustering or cfg.target_obj_id):
                continue
            # the feat loss needs exact-feature labels, which only
            # --feed_exact_feat / --target_exact_feat load (reference
            # data_out 'feat' is keyed on exactly these two flags,
            # lxmert_pretrain.py:733 — independent of clustering; on the
            # bbox path vis_feats are always present as the input)
            if k == "feat" and not (cfg.feed_exact_feat
                                    or cfg.target_exact_feat
                                    or not cfg.grid_model):
                continue
            heads.append(k)
    if cfg.task_qa:
        heads.append("qa")
    return tuple(heads)


def build_inputs_and_labels(batch: Dict[str, jnp.ndarray], rng, task: str,
                            cfg: TrainConfig, centroids, compute_dtype,
                            vocab_size: int = 30522, mask_token_id: int = 103):
    """On-device input/label construction for one task — the jit-side
    equivalent of Trainer.forward's label_dict dispatch
    (lxmert_pretrain.py:143-225) plus the collate-side masking."""
    n_cells = cfg.n_vis
    labels: Dict[str, jnp.ndarray] = {}
    cluster_id = batch.get("cluster_id")

    if task == "word_mask":
        if "masked_word_id" in batch:
            # host-masked mode: the loader supplies the masked ids +
            # labels exactly as the reference dataset does
            # (lxmert_data.py random_word / masked_word_id, word_label);
            # also what the trajectory-parity test feeds both frameworks
            input_ids = batch["masked_word_id"]
            labels["word_labels"] = batch["word_label"]
        else:
            input_ids, word_labels = random_word_mask(
                rng, batch["word_id"], cfg.word_mask_rate,
                vocab_size=vocab_size, mask_token_id=mask_token_id)
            labels["word_labels"] = word_labels
        vis_mask = None
    elif task == "matched":
        input_ids = batch["other_word_id"]
        labels["matched_labels"] = batch["matched_label"]
        vis_mask = None
    elif task == "vis_mask":
        # --vis_mask_COCO(VG)_only: the vis_mask task trains on a
        # substitute COCO/VG example (caption + its cluster grid),
        # provided by the loader (lxmert_data.py:466-492).
        # NOTE the substitution swaps ONLY word ids (+ cluster ids when
        # clustering) — any feat_labels/qa_labels still come from the
        # ORIGINAL example, exactly as the reference behaves
        # (lxmert_pretrain.py:597-599 substitutes those two keys and
        # nothing else; its feat labels read batch['vis_feats'] at :178
        # and qa_label at :185 unsubstituted). The mismatch is unreachable
        # under the canonical recipe (clustering + visualLosses obj,
        # task_qa off for the vis_mask substitution sources).
        if ((cfg.vis_mask_COCO_only or cfg.vis_mask_COCOVG_only)
                and "coco_word_id" in batch):
            input_ids = batch["coco_word_id"]
            # the caption is substituted on every path; the visual input
            # only in clustering mode — bbox/grid paths keep the
            # original image (lxmert_pretrain.py:594-598)
            if cfg.clustering:
                cluster_id = batch["coco_cluster_id"]
        else:
            input_ids = batch["word_id"]
        if "vis_mask" in batch:
            # host-masked mode (see word_mask above): precomputed mask,
            # reference lxmert_pretrain.py:155 consumes batch['vis_mask']
            vis_mask = batch["vis_mask"].astype(jnp.float32)
        elif cfg.square_mask:
            vis_mask = square_vis_mask(rng, input_ids.shape[0], cfg.grid_size)
        elif cfg.vis_mask_predict:
            vis_mask = uniform_count_vis_mask(rng, input_ids.shape[0], n_cells)
        else:
            vis_mask = (jax.random.uniform(rng, (input_ids.shape[0], n_cells))
                        < cfg.obj_mask_rate).astype(jnp.float32)
        if "obj" in cfg.visual_loss_keys:
            # clustering: labels are cluster ids; bbox path: detector obj
            # ids via --target_obj_id (lxmert_pretrain.py:162-170)
            if cfg.clustering:
                obj_target = cluster_id
            elif cfg.target_obj_id:
                obj_target = batch["obj_id"]
            else:
                obj_target = None
            if obj_target is not None:
                labels["obj_labels"] = jnp.where(
                    vis_mask > 0, obj_target, -100)
        # attr labels have no loader source in the reference either —
        # its data_out never includes 'attr_prob', so batch['attr_label']
        # only exists when an API caller supplies it
        # (lxmert_pretrain.py:723-741 vs lxmert_data.py:632-634)
        if "attr" in cfg.visual_loss_keys and "attr_label" in batch:
            labels["attr_labels"] = jnp.where(
                vis_mask > 0, batch["attr_label"], -100)
        if "feat" in cfg.visual_loss_keys and (
                cfg.feed_exact_feat or cfg.target_exact_feat
                or not cfg.grid_model):
            labels["feat_labels"] = batch["vis_feats"]
            labels["vis_mask"] = vis_mask
    else:
        raise ValueError(task)

    if cfg.task_qa:
        qa = batch["qa_label"]
        if task == "matched":
            # mismatched pairs can't supervise QA (lxmert_pretrain.py:186-189)
            qa = jnp.where(batch["matched_label"] == 0, -100, qa)
        labels["qa_labels"] = qa

    if cfg.clustering:
        visual_feats = embed_clusters(cluster_id, centroids, compute_dtype)
    else:
        visual_feats = batch["vis_feats"].astype(compute_dtype)

    attention_mask = (input_ids > 0).astype(jnp.float32)
    return input_ids, attention_mask, visual_feats, vis_mask, labels


class PretrainEngine:
    """Owns the model, optimizer, mesh, and per-task compiled steps."""

    def __init__(self, cfg: TrainConfig, model_cfg: Optional[LxmertConfig] = None,
                 total_steps: int = 100_000, mesh=None):
        self.cfg = cfg
        self.model_cfg = model_cfg or LxmertConfig(
            num_clusters=cfg.num_clusters if cfg.clustering else 0)
        self.compute_dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
        self.model = XLxmert(self.model_cfg, dtype=self.compute_dtype,
                             task_qa=cfg.task_qa)
        # NOTE no update_freq here: the reference pretrain trainer never
        # accumulates (--update_freq is consumed only by the finetune
        # Trainers, vqa.py:151-159 / gqa.py:120-127 / nlvr2.py:176-179 —
        # lxmert_pretrain.py has no such gate), so neither do we.
        self._opt_kwargs = dict(
            lr=cfg.lr, total_steps=total_steps,
            warmup_ratio=cfg.warmup_ratio, weight_decay=cfg.weight_decay,
            clip_grad_norm=cfg.clip_grad_norm, adam_eps=cfg.adam_eps)
        self.tx = make_optimizer(**self._opt_kwargs)
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.mesh_shape, cfg.mesh_axis_names)
        self.box_pos = jnp.asarray(box_position(cfg.grid_size))
        self._train_steps: Dict[str, Any] = {}
        self._raw_train_steps: Dict[str, Any] = {}
        self._eval_steps: Dict[str, Any] = {}
        self._loss_fns: Dict[str, Any] = {}

    # -- initialization -----------------------------------------------------
    def init_params(self, rng) -> Any:
        B, L, V = 2, self.cfg.max_text_length, self.cfg.n_vis
        dummy_feats = jnp.zeros((B, V, self.model_cfg.visual_feat_dim),
                                self.compute_dtype)
        dummy_centroids = jnp.zeros(
            (max(self.model_cfg.num_clusters, 1), self.model_cfg.visual_feat_dim))
        heads = set()
        for t in self.cfg.mask_modalities:
            heads.update(_task_heads(t, self.cfg))
        # jitted init: eager flax init dispatches the 19-layer stack
        # op-by-op (~90s through the remote-compile tunnel vs one program)
        variables = jax.jit(lambda r: self.model.init(
            r, jnp.ones((B, L), jnp.int32), dummy_feats,
            jnp.zeros((B, V, 4)),
            attention_mask=jnp.ones((B, L)),
            vis_mask=jnp.zeros((B, V)),
            centroids=dummy_centroids,
            word_embedding_matrix=jnp.zeros(
                (self.model_cfg.vocab_size, self.model_cfg.hidden_size)),
            heads=tuple(sorted(heads)),
            deterministic=True))(rng)
        return variables["params"]

    def create_state(self, rng) -> TrainState:
        params = self.init_params(rng)
        if self.mesh.shape.get("model", 1) > 1:
            # dp x tp: Megatron-style column/row param shardings over the
            # "model" axis (parallel/sharding.py); the optimizer state
            # inherits each param's sharding through tx.init, and GSPMD
            # inserts the TP collectives inside the jitted step.
            from xlxmert_tpu.parallel.sharding import shard_params

            params = shard_params(params, self.mesh)
            state = TrainState.create(params, self.tx)
            from xlxmert_tpu.parallel.mesh import replicated

            return state.replace(
                step=jax.device_put(state.step, replicated(self.mesh)))
        state = TrainState.create(params, self.tx)
        return replicate(state, self.mesh)

    # -- steps ----------------------------------------------------------------
    def _make_step(self, task: str, train: bool):
        cfg, model = self.cfg, self.model
        heads = _task_heads(task, cfg)
        box_pos = self.box_pos
        compute_dtype = self.compute_dtype

        vocab_size = self.model_cfg.vocab_size
        mask_token_id = min(103, vocab_size - 1)

        def loss_fn(params, batch, rng, centroids, deterministic):
            input_ids, attn, vfeats, vis_mask, labels = build_inputs_and_labels(
                batch, rng, task, cfg, centroids, compute_dtype,
                vocab_size=vocab_size, mask_token_id=mask_token_id)
            B = input_ids.shape[0]
            if "boxes" in batch:  # bbox path: real per-image positions
                pos = batch["boxes"]
            else:
                pos = jnp.broadcast_to(box_pos[None], (B,) + box_pos.shape)
            out = model.apply(
                {"params": params}, input_ids, vfeats, pos,
                attention_mask=attn, vis_mask=vis_mask,
                centroids=centroids,
                word_embedding_matrix=get_word_embedding_matrix(params),
                heads=heads, deterministic=deterministic,
                rngs=None if deterministic else {"dropout": jax.random.fold_in(rng, 1)})
            losses = pretrain_losses(out, labels, task, cfg.visual_loss_keys,
                                     cfg.task_qa)
            metrics = {k: v for k, v in losses.items() if k != "qa_pred"}
            if cfg.task_qa and "qa_pred" in losses:
                # in-program QA accuracy over labeled examples — the
                # SPMD replacement for the QAEvaluator epoch reduce
                # (lxmert_pretrain.py:462-481)
                qa = labels["qa_labels"]
                valid = qa >= 0
                correct = (losses["qa_pred"] == qa) & valid
                metrics["qa_acc"] = (correct.sum().astype(jnp.float32)
                                     / jnp.maximum(valid.sum(), 1))
                metrics["qa_pred"] = losses["qa_pred"]
            return losses["total_loss"], metrics

        self._loss_fns[task] = loss_fn

        if train:
            opt_kwargs = self._opt_kwargs

            def step(state: TrainState, batch, rng, centroids):
                rng = jax.random.fold_in(rng, state.step)
                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, batch, rng,
                                           centroids, False)
                # per-task optimizer: same state structure as state.tx,
                # but leaves outside this task's loss subgraph are
                # skipped entirely (torch grad-None semantics — see
                # used_param_mask / core/optim.reference_adamw)
                tx_task = make_optimizer(
                    used_mask=used_param_mask(state.params, task, cfg),
                    **opt_kwargs)
                updates, new_opt = tx_task.update(
                    grads, state.opt_state, state.params)
                new_state = state.replace(
                    step=state.step + 1,
                    params=optax.apply_updates(state.params, updates),
                    opt_state=new_opt)
                metrics["grad_norm"] = optax.global_norm(grads)
                return new_state, metrics

            self._raw_train_steps[task] = step
            return jax.jit(step, donate_argnums=(0,))

        def estep(params, batch, rng, centroids):
            _, metrics = loss_fn(params, batch, rng, centroids, True)
            return metrics

        return jax.jit(estep)

    def train_step(self, task: str):
        if task not in self._train_steps:
            self._train_steps[task] = self._make_step(task, train=True)
        return self._train_steps[task]

    def loss_fn(self, task: str):
        """The raw per-task loss closure
        fn(params, batch, rng, centroids, deterministic) -> (loss,
        metrics) — un-jitted, for step-time attribution probes
        (scripts/drive_pretrain.py --attrib) that need forward-only /
        grad-only variants of the exact training computation."""
        if task not in self._loss_fns:
            self.train_step(task)
        return self._loss_fns[task]

    def chained_train_step(self, task: str, k: int,
                           per_step_batches: bool = False):
        """K train steps chained in ONE jitted lax.scan — the per-step
        host round-trip (dispatch + metric fetch) amortizes to 1/k.

        per_step_batches=False: all k steps train on the SAME batch
        (only the rng stream differs per step). This is the honest
        device-rate measurement through the axon tunnel
        (scripts/drive_pretrain.py --chain) — it is NOT a substitute
        for k distinct data batches.

        per_step_batches=True: the production shape for metric-light
        phases — batch leaves are stacked to (k, B, ...) (use
        `place_stacked`) and the scan consumes one slice per step, so
        semantics equal k sequential train_step calls on k distinct
        batches with one dispatch + one metric fetch.

        Returns fn(state, batch, rng, centroids)
          -> (state, mean_total_loss over the k steps)."""
        self.train_step(task)  # ensure the raw step exists
        step = self._raw_train_steps[task]

        def many(state, batch, rng, centroids):
            # the raw step folds rng by state.step, so each chained
            # step gets a distinct stream and k chained steps are
            # numerically IDENTICAL to k sequential train_step calls
            # (pinned in tests/test_pretrain_engine.py)
            def body(s, b):
                s2, m = step(s, batch if b is None else b, rng, centroids)
                return s2, m["total_loss"]

            if per_step_batches:
                state, losses = jax.lax.scan(body, state, batch, length=k)
            else:
                state, losses = jax.lax.scan(body, state, None, length=k)
            return state, losses.mean()

        return jax.jit(many, donate_argnums=(0,))

    def place_stacked(self, batches):
        """Stack k host batches (list of dicts) to (k, B, ...) leaves,
        sharded over the data axis on dim 1 — the input shape for
        chained_train_step(..., per_step_batches=True). Multi-host:
        like shard_batch, each host passes its own k local batches and
        the global array is assembled from process-local shards."""
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
        sh = NamedSharding(self.mesh, P(None, "data"))
        if jax.process_count() > 1:
            n_proc = jax.process_count()

            def put(x):
                global_shape = ((x.shape[0], x.shape[1] * n_proc)
                                + tuple(x.shape[2:]))
                return jax.make_array_from_process_local_data(
                    sh, x, global_shape)

            return jax.tree.map(put, stacked)
        return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)

    def eval_step(self, task: str):
        if task not in self._eval_steps:
            self._eval_steps[task] = self._make_step(task, train=False)
        return self._eval_steps[task]

    # -- data placement -------------------------------------------------------
    def place(self, batch):
        return shard_batch(batch, self.mesh)

    def task_for_step(self, step: int) -> str:
        mods = self.cfg.mask_modalities
        return mods[step % len(mods)]
