"""GAN training engine tests on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from xlxmert_tpu.core.config import GanConfig
from xlxmert_tpu.tasks.train_generator import GanEngine


def tiny_cfg():
    return GanConfig(emb_dim=32, codebook_dim=16, g_base_dim=8, d_base_dim=8,
                     init_H=4, init_W=4, target_size=16, n_classes=13,
                     mixed_precision=False, batch_size=8)


def make_batch(cfg, B=8, seed=0):
    rng = np.random.RandomState(seed)
    n_cells = cfg.init_H * cfg.init_W
    centroids = rng.randn(cfg.n_classes, cfg.emb_dim).astype(np.float32)
    ids = rng.randint(0, cfg.n_classes, (B, n_cells)).astype(np.int32)
    code = centroids[ids].reshape(B, cfg.init_H, cfg.init_W, cfg.emb_dim)
    image = np.tanh(rng.randn(B, cfg.target_size, cfg.target_size, 3)
                    ).astype(np.float32)
    return {"image": image, "code": code, "cluster_id": ids}, centroids


def test_gan_steps_run_and_update():
    cfg = tiny_cfg()
    eng = GanEngine(cfg)
    batch_np, centroids_np = make_batch(cfg)
    centroids = jnp.asarray(centroids_np)
    state = eng.create_state(jax.random.PRNGKey(0), centroids)
    batch = eng.place(batch_np)
    rng = jax.random.PRNGKey(1)

    g0 = jax.tree.map(np.asarray, state.params_g)
    d0 = jax.tree.map(np.asarray, state.params_d)

    state, dm = eng.d_step()(state, batch, centroids, rng)
    state, gm = eng.g_step()(state, batch, centroids, rng)

    for k in ("d_adv_loss", "d_cls_loss", "d_total"):
        assert np.isfinite(float(dm[k])), k
    for k in ("g_adv_loss", "g_cls_loss", "g_feat_match", "g_total"):
        assert np.isfinite(float(gm[k])), k

    # both param sets actually moved
    g1 = jax.tree.map(np.asarray, state.params_g)
    d1 = jax.tree.map(np.asarray, state.params_d)
    g_moved = any(np.abs(a - b).max() > 0 for a, b in
                  zip(jax.tree.leaves(g0), jax.tree.leaves(g1)))
    d_moved = any(np.abs(a - b).max() > 0 for a, b in
                  zip(jax.tree.leaves(d0), jax.tree.leaves(d1)))
    assert g_moved and d_moved


def test_gan_adversarial_dynamics():
    """Alternating steps with pure hinge (cls/fm off, D lr up for speed):
    D must separate real from fake and its hinge loss must fall."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg(), lambda_cls=0.0, d_lr=1e-3,
                              lambda_feat_match=0.0)
    eng = GanEngine(cfg)
    batch_np, centroids_np = make_batch(cfg)
    centroids = jnp.asarray(centroids_np)
    state = eng.create_state(jax.random.PRNGKey(0), centroids)
    batch = eng.place(batch_np)
    rng = jax.random.PRNGKey(2)
    d_losses = []
    for i in range(25):
        state, dm = eng.d_step()(state, batch, centroids,
                                 jax.random.fold_in(rng, i))
        state, gm = eng.g_step()(state, batch, centroids,
                                 jax.random.fold_in(rng, 100 + i))
        assert np.isfinite(float(dm["d_total"]))
        assert np.isfinite(float(gm["g_total"]))
        d_losses.append(float(dm["d_adv_loss"]))
    # D is learning: hinge loss drops and real pulls above fake
    assert d_losses[-1] < d_losses[0]
    assert float(dm["d_real"]) > float(dm["d_fake"])


def test_render_range_and_shape():
    cfg = tiny_cfg()
    eng = GanEngine(cfg)
    batch_np, centroids_np = make_batch(cfg)
    centroids = jnp.asarray(centroids_np)
    state = eng.create_state(jax.random.PRNGKey(0), centroids)
    img = eng.render()(state.params_g, state.sn_g,
                       jnp.asarray(batch_np["code"]))
    img = np.asarray(img)
    assert img.shape == (8, cfg.target_size, cfg.target_size, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_spade_bn_trains_with_synced_stats():
    """norm_type="spade_bn" (main.py:149-151 SyncBatchNorm equivalent):
    running stats exist, update during training, and are computed over the
    GLOBAL batch — the same values whether the batch is sharded over the
    8-device mesh or lives on one device."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg(), norm_type="spade_bn")
    eng = GanEngine(cfg)
    batch_np, centroids_np = make_batch(cfg)
    centroids = jnp.asarray(centroids_np)
    state = eng.create_state(jax.random.PRNGKey(0), centroids)
    assert jax.tree.leaves(state.stats_g), "batch_stats missing"
    stats0 = jax.tree.map(np.asarray, state.stats_g)

    batch = eng.place(batch_np)
    state, dm = eng.d_step()(state, batch, centroids, jax.random.PRNGKey(1))
    state, gm = eng.g_step()(state, batch, centroids, jax.random.PRNGKey(2))
    assert np.isfinite(float(gm["g_total"]))
    stats1 = jax.tree.map(np.asarray, state.stats_g)
    moved = any(np.abs(a - b).max() > 0 for a, b in
                zip(jax.tree.leaves(stats0), jax.tree.leaves(stats1)))
    assert moved, "running stats did not update"

    # sync semantics: a train-mode forward over the mesh-sharded batch
    # must equal the single-device forward (stats are global-batch)
    code = jnp.asarray(batch_np["code"])
    out_local = eng.G.apply(
        {"params": state.params_g, "sn": state.sn_g,
         "batch_stats": state.stats_g}, code, train=True,
        rngs={"noise": jax.random.PRNGKey(0)}, mutable=["batch_stats"])[0]

    from xlxmert_tpu.parallel.mesh import data_sharding

    code_sharded = jax.device_put(code, data_sharding(eng.mesh))
    out_sharded = jax.jit(lambda c: eng.G.apply(
        {"params": state.params_g, "sn": state.sn_g,
         "batch_stats": state.stats_g}, c, train=True,
        rngs={"noise": jax.random.PRNGKey(0)},
        mutable=["batch_stats"])[0])(code_sharded)
    np.testing.assert_allclose(np.asarray(out_local),
                               np.asarray(out_sharded), atol=2e-5)

    # eval path consumes the running stats through render()
    img = eng.render()(state.params_g, state.sn_g, code, state.stats_g)
    assert np.isfinite(np.asarray(img)).all()


def test_chained_gd_equals_sequential():
    """chained_gd_step(k) must be numerically identical to k sequential
    (d_step, g_step) pairs (same rng folding; donation-safe)."""
    cfg = tiny_cfg()
    batch_np, centroids_np = make_batch(cfg)
    centroids = jnp.asarray(centroids_np)
    rng = jax.random.PRNGKey(3)
    K = 3

    eng1 = GanEngine(cfg)
    s1 = eng1.create_state(jax.random.PRNGKey(0), centroids)
    b1 = eng1.place(batch_np)
    d, g = eng1.d_step(), eng1.g_step()
    d_losses, g_losses = [], []
    for _ in range(K):
        s1, dm = d(s1, b1, centroids, rng)
        s1, gm = g(s1, b1, centroids, rng)
        d_losses.append(float(dm["d_total"]))
        g_losses.append(float(gm["g_total"]))

    eng2 = GanEngine(cfg)
    s2 = eng2.create_state(jax.random.PRNGKey(0), centroids)
    b2 = eng2.place(batch_np)
    s2, dl, gl = eng2.chained_gd_step(K)(s2, b2, centroids, rng)

    np.testing.assert_allclose(float(dl), np.mean(d_losses), rtol=1e-5)
    np.testing.assert_allclose(float(gl), np.mean(g_losses), rtol=1e-5)
    # params: Adam(beta1=0) is sign-SGD-like (update = lr*g/(|g|+eps)),
    # so ULP-level gradient differences between the scan and eager
    # compilations flip near-zero coordinates by up to ~2*lr (g_lr=4e-4
    # here; measured bound isolated to a single g-step, sn/batch_stats
    # bit-identical). Pin to the update-scale bound per step.
    bound = 2 * cfg.g_lr * K
    for a, b in zip(jax.tree.leaves(s1.params_g),
                    jax.tree.leaves(s2.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=bound)
    # sn power-iteration state (unit vectors; downstream of the param
    # noise above, so close-not-exact across k steps)
    for a, b in zip(jax.tree.leaves(s1.sn_g), jax.tree.leaves(s2.sn_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-2)


def test_gan_config_defaults_pin_reference_recipe():
    """The step-oracle (test_gan_step_oracle) reads CFG.lambda_* on BOTH
    sides, so it pins the loss COMPOSITION but is self-referential for
    the lambda VALUES. This pins the values (and the optimizer recipe)
    to the reference's configs.py defaults:
      gan_loss_lambda=1 / gan_loss_cluster_lambda=1 /
      feat_loss_lambda=10 / gan_feat_match_lambda=10 (configs.py:119-134)
      g_lr=4e-4 / d_lr=1e-4 / Adam beta1=0, beta2=0.999 (configs.py:61-72)
    so a drifted default fails here even though the oracle would track it."""
    from xlxmert_tpu.core.config import GanConfig

    cfg = GanConfig()
    assert cfg.lambda_adv == 1.0
    assert cfg.lambda_cls == 1.0
    assert cfg.lambda_feat == 10.0
    assert cfg.lambda_feat_match == 10.0
    assert cfg.g_lr == 4e-4
    assert cfg.d_lr == 1e-4
    assert cfg.adam_beta1 == 0.0
    assert cfg.adam_beta2 == 0.999
