"""Shared finetune engine for VQA / GQA / NLVR2.

The reference copy-pastes one Trainer per task (tasks/vqa.py:28-327,
gqa.py:28-291, nlvr2.py:27-338 — "No shared trainer abstraction exists",
SURVEY.md §1). Here a single engine covers all three, parameterized by:
  - loss: BCE-with-logits vs soft targets (VQA/GQA, vqa.py:73,187) or
    CE vs hard labels (NLVR2, nlvr2.py:72,171)
  - model: VQAModel (pooled CLS head) or NLVR2Model (2-image concat)

Optimization matches the reference: AdamW + linear warmup/decay, grad clip,
update_freq accumulation (vqa.py:152-159), best/last checkpointing
(vqa.py:239-257).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xlxmert_tpu.core.config import FinetuneConfig, LxmertConfig
from xlxmert_tpu.core.optim import make_optimizer
from xlxmert_tpu.models.task_heads import NLVR2Model, VQAModel
from xlxmert_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from xlxmert_tpu.tasks.pretrain import TrainState


def should_update(step_i: int, n_batches: int, update_freq: int) -> bool:
    """The reference's update_freq gate, transcribed from vqa.py:151-159
    (gqa.py:120-127 identical): with accumulation, step 0 NEVER updates —
    the first update at step k covers k+1 batches — then every k-th step
    updates, plus a forced flush on the last batch of the epoch."""
    if update_freq <= 1:
        return True
    if step_i == 0:
        return False
    return step_i % update_freq == 0 or step_i == n_batches - 1


class AccumTrainState(TrainState):
    """TrainState + a raw gradient-SUM accumulator reproducing the
    reference's update_freq semantics exactly (vqa.py:151-198):
    `loss.backward()` SUMS grads across held batches (no averaging —
    optax.MultiSteps averages, which changes the clip threshold's bite),
    clip + AdamW + scheduler all advance only on update steps (clip is
    applied to the accumulated sum), and grads reset to zero after each
    update (`param.grad = None`, vqa.py:196-197)."""

    acc: Any = None

    def accumulate_or_apply(self, grads, do_update):
        acc = jax.tree.map(jnp.add, self.acc, grads)

        def apply(s):
            updates, new_opt = s.tx.update(acc, s.opt_state, s.params)
            return s.replace(
                step=s.step + 1,
                params=optax.apply_updates(s.params, updates),
                opt_state=new_opt,
                acc=jax.tree.map(jnp.zeros_like, acc))

        def hold(s):
            return s.replace(step=s.step + 1, acc=acc)

        return jax.lax.cond(do_update, apply, hold, self)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params),
                   acc=jax.tree.map(jnp.zeros_like, params), tx=tx)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary CE with logits vs soft targets (torch BCEWithLogitsLoss
    default reduction='mean' — vqa.py:73). Deliberately NO
    `* logit.size(1)` scaling: the ORIGINAL lxmert repo multiplies by
    the answer count, but this reference does not (vqa.py:187 ->
    backward at :189 unscaled; gqa.py:150 likewise) — we match the
    reference's recipe at its documented lr."""
    logits = logits.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(targets * log_p + (1.0 - targets) * log_not_p).mean()


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


class FinetuneEngine:
    """task in {"vqa", "gqa", "nlvr2"}."""

    def __init__(self, cfg: FinetuneConfig, num_answers: int,
                 model_cfg: Optional[LxmertConfig] = None,
                 total_steps: int = 10_000, mesh=None):
        self.cfg = cfg
        self.task = cfg.task
        self.num_answers = num_answers
        self.model_cfg = model_cfg or LxmertConfig()
        self.compute_dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
        if self.task == "nlvr2":
            self.model = NLVR2Model(self.model_cfg, num_answers,
                                    dtype=self.compute_dtype)
        else:
            self.model = VQAModel(self.model_cfg, num_answers,
                                  dtype=self.compute_dtype)
        # update_freq accumulation is implemented by AccumTrainState
        # (reference-exact grad sums), NOT by optax.MultiSteps — the
        # optimizer itself is always the plain reference chain.
        self.update_freq = cfg.update_freq
        self.tx = make_optimizer(cfg.lr, total_steps, cfg.warmup_ratio,
                                 cfg.weight_decay, cfg.clip_grad_norm,
                                 cfg.adam_eps)
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.mesh_shape, cfg.mesh_axis_names)
        self._train_step = None
        self._predict_step = None

    # -- init ---------------------------------------------------------------
    def _dummy_inputs(self, B=2):
        L, V = self.cfg.max_text_length, self.cfg.n_grids
        D = self.model_cfg.visual_feat_dim
        ids = jnp.ones((B, L), jnp.int32)
        if self.task == "nlvr2":
            feats = jnp.zeros((B, 2, V, D))
            pos = jnp.zeros((B, 2, V, 4))
        else:
            feats = jnp.zeros((B, V, D))
            pos = jnp.zeros((B, V, 4))
        return ids, feats, pos, jnp.ones((B, L))

    def init_params(self, rng):
        ids, feats, pos, mask = self._dummy_inputs()
        return jax.jit(lambda r: self.model.init(
            r, ids, feats, pos, attention_mask=mask,
            deterministic=True))(rng)["params"]

    def create_state(self, rng, params=None) -> TrainState:
        params = params if params is not None else self.init_params(rng)
        cls = AccumTrainState if self.update_freq > 1 else TrainState
        return replicate(cls.create(params, self.tx), self.mesh)

    def load_pretrained(self, params, pretrain_params, label2ans=None,
                        answer_table=None):
        """Overlay converted pretrain weights (bert + optional QA-head
        surgery) onto freshly-initialized finetune params."""
        from xlxmert_tpu.core.checkpoint import merge_params

        new = dict(params)
        if "bert" in pretrain_params:
            # strict=False overlay (reference loads all ckpts that way)
            new["bert"], _, _ = merge_params(params["bert"],
                                             pretrain_params["bert"])
        if (label2ans is not None and answer_table is not None
                and "answer_head" in pretrain_params):
            from xlxmert_tpu.data.answer_table import surgery_answer_head

            merged, counts = surgery_answer_head(
                pretrain_params, new, answer_table, label2ans)
            return merged, counts
        return new, None

    # -- steps ----------------------------------------------------------------
    def train_step(self):
        if self._train_step is not None:
            return self._train_step
        model, task = self.model, self.task

        def loss_fn(params, batch, rng):
            logits = model.apply(
                {"params": params}, batch["word_ids"], batch["vis_feats"],
                batch["boxes"],
                attention_mask=(batch["word_ids"] > 0).astype(jnp.float32),
                deterministic=False, rngs={"dropout": rng})
            if task == "nlvr2":
                loss = softmax_ce(logits, batch["labels"])
            else:
                loss = bce_with_logits(logits, batch["targets"])
            acc_pred = jnp.argmax(logits, axis=-1)
            return loss, acc_pred

        if self.update_freq > 1:
            # (state, batch, rng, do_update): accumulate raw grad sums,
            # step the optimizer only when the host-side should_update
            # gate (vqa.py:151-159) fires.
            def step(state: AccumTrainState, batch, rng, do_update):
                rng = jax.random.fold_in(rng, state.step)
                (loss, pred), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, batch, rng)
                new_state = state.accumulate_or_apply(grads, do_update)
                metrics = {"loss": loss, "pred": pred,
                           "grad_norm": optax.global_norm(grads)}
                return new_state, metrics
        else:
            def step(state: TrainState, batch, rng):
                rng = jax.random.fold_in(rng, state.step)
                (loss, pred), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, batch, rng)
                new_state = state.apply_gradients(grads)
                metrics = {"loss": loss, "pred": pred,
                           "grad_norm": optax.global_norm(grads)}
                return new_state, metrics

        self._train_step = jax.jit(step, donate_argnums=(0,))
        return self._train_step

    def predict_step(self):
        if self._predict_step is not None:
            return self._predict_step
        model = self.model

        def step(params, batch):
            logits = model.apply(
                {"params": params}, batch["word_ids"], batch["vis_feats"],
                batch["boxes"],
                attention_mask=(batch["word_ids"] > 0).astype(jnp.float32),
                deterministic=True)
            return jnp.argmax(logits, axis=-1), logits

        self._predict_step = jax.jit(step)
        return self._predict_step

    def place(self, batch):
        return shard_batch(batch, self.mesh)

    def _make_int8_predict(self, params, calib_batches, place=None):
        """Build a jitted int8 predict step (serving/lxmert_int8.py),
        statically calibrated on `calib_batches` (a list — predict()
        accumulates the first few eval batches so the scales don't
        depend on one possibly-unrepresentative batch, advisor r2).
        Opt-in for eval/test
        dumps (--serve_int8): answer agreement with the fp32 path is
        pinned >=0.8 in tests on tiny random weights (near-tie margins)
        and measured 1.00 on-chip (vqa + nlvr2); the measured win is
        +15-25% over the bf16 forward. Validate agreement on your real
        checkpoint before accuracy-sensitive submissions."""
        from xlxmert_tpu.serving import lxmert_int8 as engine

        head_key = "logit_fc" if self.task == "nlvr2" else "answer_head"
        host = jax.tree.map(np.asarray, params)
        qp = engine.prepare_params(host["bert"], self.model_cfg)
        hqp = engine.prepare_answer_head(host[head_key])
        n_heads = self.model_cfg.num_attention_heads

        def unpack(batch):
            ids = batch["word_ids"]
            mask = (ids > 0).astype(jnp.float32)
            return ids, batch["vis_feats"], batch["boxes"], mask

        if self.task == "nlvr2":
            def fwd(qp_, hqp_, ids, feats, pos, mask):
                return engine.nlvr2_forward(qp_, hqp_, ids, feats, pos,
                                            attention_mask=mask,
                                            n_heads=n_heads)
        else:
            def fwd(qp_, hqp_, ids, feats, pos, mask):
                _, _, pooled = engine.lxmert_forward(
                    qp_, ids, feats, pos, attention_mask=mask,
                    n_heads=n_heads)
                return engine.answer_head_forward(hqp_, pooled)

        calib = engine.calibrate_forward(
            fwd, (qp, hqp), [unpack(b) for b in calib_batches])
        sqp = engine.apply_calibration(qp, calib)
        shqp = engine.apply_calibration(hqp, calib)
        engine.assert_fully_calibrated(sqp, shqp)
        # commit the quantized trees to device ONCE — host-numpy
        # closures would re-upload the whole weight set every batch
        sqp = jax.device_put(sqp)
        shqp = jax.device_put(shqp)
        step = jax.jit(lambda a, b, i, f, p, m: jnp.argmax(
            fwd(a, b, i, f, p, m), axis=-1))

        place = place if place is not None else self.place

        def run(batch):
            ids, feats, pos, mask = unpack(place(batch))
            return step(sqp, shqp, ids, feats, pos, mask)

        return run

    # -- loops ----------------------------------------------------------------
    def predict(self, params, batches: Iterable[Dict[str, Any]],
                label2ans=None, int8: bool = False,
                calib_batches: int = 4,
                shard_dir: Optional[str] = None) -> Dict[Any, Any]:
        """Run prediction over host batches; returns quesid->answer
        (mapped through label2ans when given, else raw label ids).
        Mirrors Trainer.predict (vqa.py:259-295). int8=True serves
        through the static-calibrated int8 engine; activation scales are
        calibrated over the first `calib_batches` batches (held back,
        then served through the calibrated step) so a single first batch
        cannot skew the scales for the whole dump.

        Multi-host (`jax.process_count() > 1`): the reference evaluates
        under DDP with a per-rank loader and a rank-0 merge
        (vqa.py:259-295 + the DistributedSampler contract); the rebuild's
        equivalent is per-process sharded prediction + host-side merge.
        `batches` must then be THIS process's shard of the eval stream
        (e.g. every process_count-th batch — prediction is embarrassingly
        parallel, so batch-level round-robin is fine and shards need not
        be equal-length), and `shard_dir` a path visible to all hosts.
        Each process re-places the (replicated) params on its own
        devices and runs a process-LOCAL jit — no global collective is
        involved until the final barrier — dumps its quesid->ans shard
        to shard_dir, and after `sync_global_devices` every process
        merges all shards, so scoring on any host sees the full dict."""
        if jax.process_count() > 1:
            if shard_dir is None:
                raise ValueError(
                    "multi-host predict needs shard_dir (a directory "
                    "shared across hosts) for the shard merge; pass the "
                    "run's output dir")
            dev = jax.local_devices()[0]
            # params are replicated on the global mesh -> every host
            # holds a full copy; fetch once and pin process-locally so
            # the predict jit never touches non-addressable shards
            params = jax.device_put(jax.tree.map(np.asarray, params), dev)
            local = self._predict_loop(
                params, batches, label2ans, int8, calib_batches,
                place=lambda b: jax.device_put(b, dev),
                local_jit=True)
            return self._merge_predict_shards(local, shard_dir)
        return self._predict_loop(params, batches, label2ans, int8,
                                  calib_batches, place=self.place)

    def _merge_predict_shards(self, local: Dict[Any, Any],
                              shard_dir: str) -> Dict[Any, Any]:
        """Write this process's quesid->ans shard, barrier, merge all.
        Dumped as [qid, ans] pairs (not a JSON object) so int question
        ids round-trip without becoming strings."""
        import json
        from pathlib import Path

        from jax.experimental import multihost_utils

        p = Path(shard_dir)
        p.mkdir(parents=True, exist_ok=True)
        pairs = [[k.item() if hasattr(k, "item") else k, v]
                 for k, v in local.items()]
        (p / f"predict_shard{jax.process_index()}.json").write_text(
            json.dumps(pairs))
        multihost_utils.sync_global_devices("xlxmert_predict_merge")
        merged: Dict[Any, Any] = {}
        for i in range(jax.process_count()):
            f = p / f"predict_shard{i}.json"
            for qid, ans in json.loads(f.read_text()):
                merged[qid] = ans
        return merged

    def _predict_loop(self, params, batches, label2ans, int8,
                      calib_batches, place, local_jit: bool = False):
        if int8:
            step = None
        elif local_jit:
            # process-local compile: same math as predict_step() but a
            # fresh jit not bound to the cached (possibly global-mesh)
            # executable
            model = self.model

            def _step(params, batch):
                logits = model.apply(
                    {"params": params}, batch["word_ids"],
                    batch["vis_feats"], batch["boxes"],
                    attention_mask=(batch["word_ids"] > 0)
                    .astype(jnp.float32),
                    deterministic=True)
                return jnp.argmax(logits, axis=-1), logits

            step = jax.jit(_step)
        else:
            step = self.predict_step()
        int8_step = None
        held: list = []
        quesid2ans: Dict[Any, Any] = {}

        def emit(qids, n_valid, preds):
            for i, qid in enumerate(qids[:n_valid]):
                p = int(preds[i])
                quesid2ans[qid] = label2ans[p] if label2ans is not None else p

        for batch in batches:
            qids = batch.pop("question_ids")
            n_valid = batch.pop("n_valid", len(qids))
            if int8:
                if int8_step is None:
                    held.append((qids, n_valid, batch))
                    if len(held) < calib_batches:
                        continue
                    int8_step = self._make_int8_predict(
                        params, [b for _, _, b in held], place=place)
                    for hq, hn, hb in held:
                        emit(hq, hn, np.asarray(int8_step(hb)))
                    held = []
                    continue
                preds = np.asarray(int8_step(batch))
            else:
                preds, _ = step(params, place(batch))
                preds = np.asarray(preds)
            emit(qids, n_valid, preds)
        if held:  # stream shorter than the calibration window
            int8_step = self._make_int8_predict(
                params, [b for _, _, b in held], place=place)
            for hq, hn, hb in held:
                emit(hq, hn, np.asarray(int8_step(hb)))
        return quesid2ans
