"""SPADE GAN trainer: hinge adversarial + ACGAN cluster CE + perceptual
feature loss + discriminator feature matching.

The reference's `image_generator/src/trainer.py` is MISSING from its repo
(main.py:25 imports it; SURVEY.md §4) — the loss recipe is reconstructed
from configs.py:119-134 + train_generator.bash:
  hinge GAN (lambda=1), ACGAN per-cell 10000-way cluster CE (lambda=1),
  perceptual feature L1 via a frozen ResNet encoder over all layers
  (lambda=10), D feature matching L1 (lambda=10); Adam(beta1=0),
  g_lr 4e-4 / d_lr 1e-4, eps 1e-7 (configs.py:57-75).

TPU-native: G-step and D-step are two jitted SPMD programs over the data
mesh; spectral-norm power iterations run inside the step ('sn' mutable
collection); the frozen perceptual encoder executes in the same program.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from xlxmert_tpu.core.config import GanConfig
from xlxmert_tpu.models.gan import Discriminator, Generator
from xlxmert_tpu.models.resnet import ResNet, normalize_image, resnet50
from xlxmert_tpu.parallel.mesh import make_mesh, replicate, shard_batch


class GanState(struct.PyTreeNode):
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    sn_g: Any
    sn_d: Any
    opt_g: Any
    opt_d: Any
    # BN running stats for norm_type="spade_bn" (empty dict otherwise);
    # stats are global-batch (SyncBatchNorm-equivalent, models/gan.py SPADE)
    stats_g: Any
    tx_g: optax.GradientTransformation = struct.field(pytree_node=False)
    tx_d: optax.GradientTransformation = struct.field(pytree_node=False)


def hinge_d_loss(real_logit: jnp.ndarray, fake_logit: jnp.ndarray) -> jnp.ndarray:
    return (jnp.maximum(0.0, 1.0 - real_logit).mean()
            + jnp.maximum(0.0, 1.0 + fake_logit).mean())


def hinge_g_loss(fake_logit: jnp.ndarray) -> jnp.ndarray:
    return -fake_logit.mean()


def cluster_ce(cls_logits: jnp.ndarray, cluster_ids: jnp.ndarray) -> jnp.ndarray:
    """Per-cell ACGAN CE: logits (B*H*W, C), ids (B, H*W)."""
    labels = cluster_ids.reshape(-1)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


class GanEngine:
    def __init__(self, cfg: GanConfig, mesh=None,
                 perceptual_variables: Optional[Any] = None):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
        self.dtype = dtype
        self.G = Generator(
            emb_dim=cfg.emb_dim, base_dim=cfg.g_base_dim,
            target_size=cfg.target_size, extra_layers=cfg.extra_layers,
            init_H=cfg.init_H, init_W=cfg.init_W, use_sn=cfg.SN,
            codebook_dim=cfg.codebook_dim, norm_type=cfg.norm_type,
            dtype=dtype)
        self.D = Discriminator(
            base_dim=cfg.d_base_dim, emb_dim=cfg.emb_dim,
            target_size=cfg.target_size, extra_layers=cfg.extra_layers,
            init_H=cfg.init_H, init_W=cfg.init_W, use_sn=cfg.SN,
            acgan=cfg.ACGAN, n_classes=cfg.n_classes, dtype=dtype)
        # perceptual encoder: frozen resnet; active only when pretrained
        # variables are supplied (no network egress here to fetch them).
        self.E: Optional[ResNet] = None
        self.E_vars = None
        if perceptual_variables is not None:
            self.E = resnet50(dtype=dtype)
            self.E_vars = perceptual_variables
        self.tx_g = optax.adam(cfg.g_lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                               eps=1e-7)
        self.tx_d = optax.adam(cfg.d_lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                               eps=1e-7)
        self.mesh = mesh if mesh is not None else make_mesh()
        self._g_step = None
        self._d_step = None

    # -- init -----------------------------------------------------------------
    def create_state(self, rng, centroids) -> GanState:
        cfg = self.cfg
        B = 2
        code = jnp.zeros((B, cfg.init_H, cfg.init_W, cfg.emb_dim))
        img = jnp.zeros((B, cfg.target_size, cfg.target_size, 3))
        rg, rd, rn = jax.random.split(rng, 3)
        g_vars = jax.jit(lambda r: self.G.init(r, code, train=True))(
            {"params": rg, "noise": rn})
        d_vars = jax.jit(lambda r: self.D.init(
            r, img, y=code, centroids=centroids))({"params": rd})
        state = GanState(
            step=jnp.zeros((), jnp.int32),
            params_g=g_vars["params"], params_d=d_vars["params"],
            sn_g=g_vars.get("sn", {}), sn_d=d_vars.get("sn", {}),
            opt_g=self.tx_g.init(g_vars["params"]),
            opt_d=self.tx_d.init(d_vars["params"]),
            stats_g=g_vars.get("batch_stats", {}),
            tx_g=self.tx_g, tx_d=self.tx_d)
        return replicate(state, self.mesh)

    # -- perceptual feature loss ----------------------------------------------
    def _perceptual(self, fake_img, real_img):
        if self.E is None:
            return jnp.float32(0.0)
        # images are tanh outputs in [-1,1] -> [0,1] -> ImageNet norm
        f = self.E.apply(self.E_vars, normalize_image((fake_img + 1) / 2),
                         return_layers=True)
        r = self.E.apply(self.E_vars, normalize_image((real_img + 1) / 2),
                         return_layers=True)
        loss = jnp.float32(0.0)
        for k in ("layer1", "layer2", "layer3", "layer4"):
            loss += jnp.abs(f[k].astype(jnp.float32)
                            - jax.lax.stop_gradient(r[k]).astype(jnp.float32)
                            ).mean()
        return loss / 4.0


    # -- steps ----------------------------------------------------------------
    def g_step(self):
        if self._g_step is not None:
            return self._g_step
        cfg, G, D = self.cfg, self.G, self.D

        def step(state: GanState, batch, centroids, rng):
            real = batch["image"]
            code = batch["code"]  # (B, H, W, emb_dim) centroid embeddings
            ids = batch["cluster_id"]  # (B, H*W)

            def loss_fn(params_g):
                fake, g_muts = G.apply(
                    {"params": params_g, "sn": state.sn_g,
                     "batch_stats": state.stats_g}, code, train=True,
                    update_sn=True, mutable=["sn", "batch_stats"],
                    rngs={"noise": jax.random.fold_in(rng, state.step)})
                d_out = D.apply(
                    {"params": state.params_d, "sn": state.sn_d}, fake,
                    y=code, centroids=centroids)
                metrics = {}
                if cfg.ACGAN:
                    adv, d_layers, cls = d_out
                    cls_loss = cluster_ce(cls, ids)
                    metrics["g_cls_loss"] = cls_loss
                else:
                    adv, d_layers = d_out
                    cls_loss = 0.0
                adv_loss = hinge_g_loss(adv)
                # D feature matching vs real (stop-grad through D(real))
                real_out = D.apply(
                    {"params": state.params_d, "sn": state.sn_d}, real,
                    y=code, centroids=centroids)
                real_layers = real_out[1]
                fm = jnp.float32(0.0)
                for fl, rl in zip(d_layers, real_layers):
                    fm += jnp.abs(fl.astype(jnp.float32)
                                  - jax.lax.stop_gradient(rl).astype(jnp.float32)
                                  ).mean()
                fm = fm / len(d_layers)
                perc = self._perceptual(fake, real)
                total = (cfg.lambda_adv * adv_loss
                         + cfg.lambda_cls * cls_loss
                         + cfg.lambda_feat_match * fm
                         + cfg.lambda_feat * perc)
                metrics.update(g_adv_loss=adv_loss, g_feat_match=fm,
                               g_perceptual=perc, g_total=total)
                return total, (metrics, g_muts)

            (loss, (metrics, g_muts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params_g)
            updates, opt_g = state.tx_g.update(grads, state.opt_g,
                                               state.params_g)
            new_state = state.replace(
                step=state.step + 1,
                params_g=optax.apply_updates(state.params_g, updates),
                opt_g=opt_g, sn_g=g_muts["sn"],
                stats_g=g_muts.get("batch_stats", state.stats_g))
            return new_state, metrics

        self._raw_g_step = step
        self._g_step = jax.jit(step, donate_argnums=(0,))
        return self._g_step

    def d_step(self):
        if self._d_step is not None:
            return self._d_step
        cfg, G, D = self.cfg, self.G, self.D

        def step(state: GanState, batch, centroids, rng):
            real = batch["image"]
            code = batch["code"]
            ids = batch["cluster_id"]
            # train-mode G forward (torch updates BN running stats on every
            # train forward, including the D step's) — keep the stat update
            fake, g_muts = G.apply(
                {"params": state.params_g, "sn": state.sn_g,
                 "batch_stats": state.stats_g}, code,
                train=True, mutable=["batch_stats"],
                rngs={"noise": jax.random.fold_in(rng, state.step)})
            fake = jax.lax.stop_gradient(fake)

            def loss_fn(params_d):
                real_out, d_muts = D.apply(
                    {"params": params_d, "sn": state.sn_d}, real, y=code,
                    centroids=centroids, update_sn=True, mutable=["sn"])
                fake_out = D.apply(
                    {"params": params_d, "sn": d_muts["sn"]}, fake, y=code,
                    centroids=centroids)
                metrics = {}
                if cfg.ACGAN:
                    real_adv, _, real_cls = real_out
                    fake_adv = fake_out[0]
                    cls_loss = cluster_ce(real_cls, ids)
                    metrics["d_cls_loss"] = cls_loss
                else:
                    real_adv = real_out[0]
                    fake_adv = fake_out[0]
                    cls_loss = 0.0
                adv_loss = hinge_d_loss(real_adv, fake_adv)
                total = cfg.lambda_adv * adv_loss + cfg.lambda_cls * cls_loss
                metrics.update(d_adv_loss=adv_loss, d_total=total,
                               d_real=real_adv.mean(), d_fake=fake_adv.mean())
                return total, (metrics, d_muts)

            (loss, (metrics, d_muts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params_d)
            updates, opt_d = state.tx_d.update(grads, state.opt_d,
                                               state.params_d)
            new_state = state.replace(
                params_d=optax.apply_updates(state.params_d, updates),
                opt_d=opt_d, sn_d=d_muts["sn"],
                stats_g=g_muts.get("batch_stats", state.stats_g))
            return new_state, metrics

        self._raw_d_step = step
        self._d_step = jax.jit(step, donate_argnums=(0,))
        return self._d_step

    def chained_gd_step(self, k: int):
        """k (D-step, G-step) pairs folded into ONE jitted lax.scan —
        the honest device-rate measurement through the axon tunnel
        (mirrors PretrainEngine.chained_train_step). NOTE: all k pairs
        train on the SAME batch (only rng/SN state evolve) — use it for
        measurement, not as a drop-in training loop. Within each pair
        the rng folding matches sequential d_step();g_step() calls
        exactly (d does not advance state.step; g does).

        Returns fn(state, batch, centroids, rng)
          -> (state, mean_d_total, mean_g_total)."""
        self.g_step()
        self.d_step()
        g, d = self._raw_g_step, self._raw_d_step

        def many(state, batch, centroids, rng):
            def body(s, _):
                s, dm = d(s, batch, centroids, rng)
                s, gm = g(s, batch, centroids, rng)
                return s, (dm["d_total"], gm["g_total"])

            state, (dl, gl) = jax.lax.scan(body, state, None, length=k)
            return state, dl.mean(), gl.mean()

        return jax.jit(many, donate_argnums=(0,))

    def render(self):
        """Jitted inference rendering: code grid -> image in [0,1]
        (the `denorm` of imggen_model.py:44-47)."""
        G = self.G

        @jax.jit
        def fn(params_g, sn_g, code, stats_g=None):
            variables = {"params": params_g, "sn": sn_g}
            if stats_g:
                variables["batch_stats"] = stats_g
            img = G.apply(variables, code, train=False)
            return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

        return fn

    def place(self, batch):
        return shard_batch(batch, self.mesh)
