"""GAN trainer torch STEP oracle (VERDICT r4 #3).

The reference's `image_generator/src/trainer.py` is missing upstream
(main.py:25 imports it; SURVEY.md §4), so the training-step recipe was
reconstructed from configs.py:119-134 + train_generator.bash. These
tests pin that reconstruction at GRADIENT level against the only torch
ground truth obtainable: the reference's OWN layer modules
(`/root/reference/image_generator/src/layers.py:135-558`, imported at
test time — not copied) driven by a torch transcription of the same
recipe (hinge + ACGAN cluster CE + D feature matching, Adam beta1=0,
eps=1e-7, g_lr/d_lr from configs.py:57-75).

From identical converted init on one fixed batch:
  - full-module forward parity (G render, D adv/cls heads),
  - one D-step and one G-step: every loss component pinned, and the
    raw step GRADIENTS compared leaf-by-leaf through the engines' own
    optimizers (with beta1=0 the Adam first moment after one step IS
    the gradient: optax mu vs torch exp_avg — measured global cosine
    ~0.999, norm ratio 1.0000).

Semantics choices shared by both sides (documented in
tasks/train_generator.py): spectral-norm power iteration runs once per
D-step on the real pass (torch: train-mode forward) and the fake pass
reuses the updated u/v (torch: eval-mode forward); the G forward inside
the D-step uses stored SN state (torch: G.eval()); G's own PI runs in
the G-step. NoiseInjection scales init at 0 so forwards are
noise-free; their gradients depend on each framework's noise draw and
are excluded from the update comparison (everything else is compared).

The perceptual term (lambda_feat, frozen ResNet L1) is exercised with
E=None here: the reference encoder needs torchvision (not installed),
so its cross-framework pin is environmentally blocked; the JAX
perceptual path is covered by tests/test_resnet.py + test_gan_trainer.
"""
import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from xlxmert_tpu.core.config import GanConfig  # noqa: E402
from xlxmert_tpu.core.convert import (  # noqa: E402
    convert_torch_state_dict, split_variables,
)
from xlxmert_tpu.tasks.train_generator import GanEngine  # noqa: E402

REF_LAYERS = "/root/reference/image_generator/src/layers.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_LAYERS),
    reason="reference layers.py not available on this machine")


def _ref_layers():
    """Import the reference's layers.py as a module (torchvision is not
    installed; only ResNetEncoder needs it, which these tests never
    instantiate, so a stub satisfies the module-level import)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace()
        sys.modules["torchvision"] = tv
    spec = importlib.util.spec_from_file_location("ref_gan_layers",
                                                  REF_LAYERS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# tiny but structurally faithful: 8x8 -> 32px = 2 upscale/downsample
# resblocks (the reference's resolution_channels table only covers
# res >= 7, so init_H stays 8)
CFG = GanConfig(emb_dim=32, codebook_dim=16, g_base_dim=16, d_base_dim=16,
                init_H=8, init_W=8, target_size=32, n_classes=7,
                mixed_precision=False, batch_size=8)
B = 8


def _to_nchw(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


def _make_batch(seed=0):
    r = np.random.RandomState(seed)
    n_cells = CFG.init_H * CFG.init_W
    centroids = (r.randn(CFG.n_classes, CFG.emb_dim) * 0.5).astype(np.float32)
    ids = r.randint(0, CFG.n_classes, (B, n_cells)).astype(np.int32)
    code = centroids[ids].reshape(B, CFG.init_H, CFG.init_W, CFG.emb_dim)
    image = np.tanh(r.randn(B, CFG.target_size, CFG.target_size, 3)
                    ).astype(np.float32)
    return {"image": image, "code": code, "cluster_id": ids}, centroids


def _build_torch(centroids):
    L = _ref_layers()
    torch.manual_seed(7)
    G = L.Generator(emb_dim=CFG.emb_dim, base_dim=CFG.g_base_dim,
                    target_size=CFG.target_size, init_H=CFG.init_H,
                    init_W=CFG.init_W, norm_type="spade_in", SN=True,
                    codebook_dim=CFG.codebook_dim)
    D = L.Discriminator(base_dim=CFG.d_base_dim, emb_dim=CFG.emb_dim,
                        target_size=CFG.target_size, init_H=CFG.init_H,
                        init_W=CFG.init_W, SN=True, ACGAN=True,
                        n_classes=CFG.n_classes)
    # main.py:98-99: the ACGAN classifier weight is the (frozen)
    # centroid table; our engine passes centroids as a constant input
    with torch.no_grad():
        D.emb_classifier.weight.copy_(torch.from_numpy(centroids))
    D.emb_classifier.weight.requires_grad_(False)
    return G, D


def _converted_variables(module):
    sd = {k: v for k, v in module.state_dict().items()
          if k != "emb_classifier.weight"}  # tied to centroids, not a param
    return split_variables(convert_torch_state_dict(sd))


def _assert_same_structure(name, ours, converted):
    ours_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_flatten_with_path(ours)[0]}
    conv_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert ours_paths == conv_paths, (
        f"{name}: missing={sorted(ours_paths - conv_paths)[:8]} "
        f"extra={sorted(conv_paths - ours_paths)[:8]}")


def _engine_state_from_torch(eng, Gt, Dt, centroids_j):
    init = eng.create_state(jax.random.PRNGKey(0), centroids_j)
    gv = _converted_variables(Gt)
    dv = _converted_variables(Dt)
    _assert_same_structure("G params", init.params_g, gv["params"])
    _assert_same_structure("D params", init.params_d, dv["params"])
    _assert_same_structure("G sn", init.sn_g, gv["sn"])
    _assert_same_structure("D sn", init.sn_d, dv["sn"])
    as_j = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    pg, pd = as_j(gv["params"]), as_j(dv["params"])
    return init.replace(
        params_g=pg, params_d=pd, sn_g=as_j(gv["sn"]), sn_d=as_j(dv["sn"]),
        opt_g=eng.tx_g.init(pg), opt_d=eng.tx_d.init(pd))


def _setup():
    batch, centroids = _make_batch()
    Gt, Dt = _build_torch(centroids)
    eng = GanEngine(CFG)
    centroids_j = jnp.asarray(centroids)
    state = _engine_state_from_torch(eng, Gt, Dt, centroids_j)
    return batch, centroids, Gt, Dt, eng, centroids_j, state


def test_full_module_forward_parity():
    """Converted-init G render and D heads agree with the reference
    modules (eval mode / stored SN state both sides)."""
    batch, centroids, Gt, Dt, eng, centroids_j, state = _setup()
    Gt.eval(), Dt.eval()
    code_t = torch.from_numpy(batch["code"])
    with torch.no_grad():
        fake_t = Gt(code_t, train=False).numpy()
        adv_t, layers_t, cls_t = Dt(
            torch.from_numpy(_to_nchw(batch["image"])), code_t,
            output_layers=True)

    fake_j = np.asarray(eng.G.apply(
        {"params": state.params_g, "sn": state.sn_g},
        jnp.asarray(batch["code"]), train=False))
    # tanh render: the transition band amplifies ~1e-6 conv/resize
    # accumulation differences; 1e-3 is still ~8x under the 8-bit PNG
    # quantum (7.9e-3), and the mean pins the bulk at fp32 tightness
    diff = np.abs(np.transpose(fake_j, (0, 3, 1, 2)) - fake_t)
    assert diff.max() < 1e-3, diff.max()
    assert diff.mean() < 2e-5, diff.mean()

    adv_j, layers_j, cls_j = eng.D.apply(
        {"params": state.params_d, "sn": state.sn_d},
        jnp.asarray(batch["image"]), y=jnp.asarray(batch["code"]),
        centroids=centroids_j)
    np.testing.assert_allclose(np.asarray(adv_j),
                               adv_t.squeeze(1).numpy(), atol=2e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(), atol=2e-4,
                               rtol=1e-4)
    assert len(layers_j) == len(layers_t)


def _torch_d_step(Gt, Dt, opt_d, batch, ids_flat):
    """One D-step of the reconstructed recipe on the reference modules.
    PI discipline: real pass in train mode (one power iteration), fake
    pass in eval mode on the updated u/v; G in eval (stored SN, no
    noise) — matching GanEngine.d_step exactly."""
    Gt.eval()
    with torch.no_grad():
        fake = Gt(torch.from_numpy(batch["code"]), train=False)
    Dt.train()
    adv_real, cls_real = Dt(torch.from_numpy(_to_nchw(batch["image"])),
                            torch.from_numpy(batch["code"]))
    Dt.eval()
    adv_fake, _ = Dt(fake, torch.from_numpy(batch["code"]))
    d_adv = (F.relu(1.0 - adv_real).mean() + F.relu(1.0 + adv_fake).mean())
    d_cls = F.cross_entropy(cls_real, ids_flat)
    total = CFG.lambda_adv * d_adv + CFG.lambda_cls * d_cls
    opt_d.zero_grad()
    total.backward()
    opt_d.step()
    return {"d_adv_loss": float(d_adv.detach()),
            "d_cls_loss": float(d_cls.detach()),
            "d_total": float(total.detach())}


def _torch_g_step(Gt, Dt, opt_g, batch, ids_flat):
    """One G-step: G train-mode forward (its own PI; noise scales are 0
    so the render is unchanged), D eval for both fake and real passes
    (GanEngine.g_step never updates D's SN state)."""
    Gt.train()
    fake = Gt(torch.from_numpy(batch["code"]), train=True)
    Dt.eval()
    adv_fake, layers_fake, cls_fake = Dt(
        fake, torch.from_numpy(batch["code"]), output_layers=True)
    with torch.no_grad():
        _, layers_real, _ = Dt(torch.from_numpy(_to_nchw(batch["image"])),
                               torch.from_numpy(batch["code"]),
                               output_layers=True)
    g_adv = -adv_fake.mean()
    g_cls = F.cross_entropy(cls_fake, ids_flat)
    fm = sum((fl - rl.detach()).abs().mean()
             for fl, rl in zip(layers_fake, layers_real)) / len(layers_fake)
    total = (CFG.lambda_adv * g_adv + CFG.lambda_cls * g_cls
             + CFG.lambda_feat_match * fm)  # lambda_feat: E=None both sides
    opt_g.zero_grad()
    total.backward()
    opt_g.step()
    return {"g_adv_loss": float(g_adv.detach()),
            "g_cls_loss": float(g_cls.detach()),
            "g_feat_match": float(fm.detach()),
            "g_total": float(total.detach())}


def _adam_mu(opt_state):
    """The ScaleByAdamState.mu tree. With beta1=0 the first moment after
    one step IS the raw gradient — the cleanest cross-framework gradient
    extraction that still goes through the engine's real optimizer."""
    for part in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "mu")):
        if hasattr(part, "mu"):
            return part.mu
    raise AssertionError("no ScaleByAdamState in optimizer state")


def _compare_grads(jax_opt_state, torch_opt, torch_module,
                   skip_noise=False):
    """Gradient-level fingerprint: optax mu vs torch exp_avg (both equal
    the raw step gradient at beta1=0), converted to the same layout.

    Direct elementwise update comparison is structurally impossible
    here: with beta1=0, eps=1e-7 the Adam update saturates to
    lr*sign(g), so any element whose true gradient sits below the
    cross-framework conv-accumulation noise (~1e-6, amplified by the
    stacked InstanceNorms and the hinge's discrete knee) flips at full
    rate. The raw gradients themselves compare cleanly: global cosine
    ~0.999, norm ratio ~1.0000 measured; conv1 biases feed
    InstanceNorm(affine=False) so their true gradient is exactly the
    spatial-mean cancellation (~1e-7 noise) and they are skipped by the
    leaf-norm floor."""
    grads_sd = {}
    for name, p in torch_module.named_parameters():
        st = torch_opt.state.get(p)
        if p.requires_grad and st is not None and "exp_avg" in st:
            grads_sd[name] = st["exp_avg"]
    conv_t = split_variables(convert_torch_state_dict(grads_sd))["params"]
    flat_j = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, _adam_mu(jax_opt_state)))[0])
    flat_t = dict(jax.tree_util.tree_flatten_with_path(conv_t)[0])
    # torch side only has entries for trainable params; the jax tree has
    # every leaf — compare the intersection and require it covers all
    # torch leaves
    assert set(flat_t) <= set(flat_j)

    per_leaf = {}
    uj_all, ut_all = [], []
    for path in flat_t:
        key = jax.tree_util.keystr(path)
        if skip_noise and "noise" in key:
            continue  # noise-scale grads depend on each framework's draw
        gj = np.asarray(flat_j[path]).ravel().astype(np.float64)
        gt = np.asarray(flat_t[path]).ravel().astype(np.float64)
        nj, nt = np.linalg.norm(gj), np.linalg.norm(gt)
        per_leaf[key] = (float(gj @ gt / (nj * nt + 1e-30)), nj, nt)
        uj_all.append(gj)
        ut_all.append(gt)
    uj, ut = np.concatenate(uj_all), np.concatenate(ut_all)
    gcos = float(uj @ ut / (np.linalg.norm(uj) * np.linalg.norm(ut)))
    gratio = float(np.linalg.norm(uj) / np.linalg.norm(ut))
    assert gcos > 0.995, (gcos, sorted(per_leaf.items(),
                                       key=lambda kv: kv[1][0])[:5])
    assert abs(gratio - 1.0) < 0.01, gratio
    floor = 1e-3 * max(n for _, n, _ in per_leaf.values())
    for key, (cos, nj, nt) in per_leaf.items():
        if nj < floor and nt < floor:
            continue  # true-zero-gradient leaf (IN-cancelled bias)
        assert cos > 0.98, (key, cos, nj, nt)
        assert 0.9 < nj / (nt + 1e-30) < 1.1, (key, nj, nt)
    return per_leaf


def test_d_step_matches_torch_transcription():
    batch, centroids, Gt, Dt, eng, centroids_j, state = _setup()
    ids_flat = torch.from_numpy(
        batch["cluster_id"].reshape(-1).astype(np.int64))
    opt_d = torch.optim.Adam(
        [p for p in Dt.parameters() if p.requires_grad],
        lr=CFG.d_lr, betas=(CFG.adam_beta1, CFG.adam_beta2), eps=1e-7)
    t_metrics = _torch_d_step(Gt, Dt, opt_d, batch, ids_flat)

    placed = eng.place(batch)
    new_state, j_metrics = eng.d_step()(state, placed, centroids_j,
                                        jax.random.PRNGKey(5))
    for k in ("d_adv_loss", "d_cls_loss", "d_total"):
        np.testing.assert_allclose(float(np.asarray(j_metrics[k])),
                                   t_metrics[k], rtol=5e-3, atol=5e-4), k

    _compare_grads(new_state.opt_d, opt_d, Dt)


def test_g_step_matches_torch_transcription():
    """D-step then G-step (the training order): the G-step sees the
    post-PI discriminator SN state on both sides."""
    batch, centroids, Gt, Dt, eng, centroids_j, state = _setup()
    ids_flat = torch.from_numpy(
        batch["cluster_id"].reshape(-1).astype(np.int64))
    opt_d = torch.optim.Adam(
        [p for p in Dt.parameters() if p.requires_grad],
        lr=CFG.d_lr, betas=(CFG.adam_beta1, CFG.adam_beta2), eps=1e-7)
    opt_g = torch.optim.Adam(Gt.parameters(), lr=CFG.g_lr,
                             betas=(CFG.adam_beta1, CFG.adam_beta2),
                             eps=1e-7)
    _torch_d_step(Gt, Dt, opt_d, batch, ids_flat)
    t_metrics = _torch_g_step(Gt, Dt, opt_g, batch, ids_flat)

    placed = eng.place(batch)
    state, _ = eng.d_step()(state, placed, centroids_j,
                            jax.random.PRNGKey(5))
    state, j_metrics = eng.g_step()(state, placed, centroids_j,
                                    jax.random.PRNGKey(6))
    for k in ("g_adv_loss", "g_cls_loss", "g_feat_match", "g_total"):
        np.testing.assert_allclose(float(np.asarray(j_metrics[k])),
                                   t_metrics[k], rtol=5e-3, atol=5e-4), k

    _compare_grads(state.opt_g, opt_g, Gt, skip_noise=True)


def test_oracle_is_binding():
    """Mutation check: perturbing one lambda must break the loss pin
    (guards against a vacuously-passing oracle)."""
    import dataclasses

    batch, centroids, Gt, Dt, eng0, centroids_j, _ = _setup()
    cfg2 = dataclasses.replace(CFG, lambda_cls=2.0)
    eng = GanEngine(cfg2)
    state = _engine_state_from_torch(eng, Gt, Dt, centroids_j)
    ids_flat = torch.from_numpy(
        batch["cluster_id"].reshape(-1).astype(np.int64))
    opt_d = torch.optim.Adam(
        [p for p in Dt.parameters() if p.requires_grad],
        lr=CFG.d_lr, betas=(0.0, 0.999), eps=1e-7)
    t_metrics = _torch_d_step(Gt, Dt, opt_d, batch, ids_flat)
    _, j_metrics = eng.d_step()(state, eng.place(batch), centroids_j,
                                jax.random.PRNGKey(5))
    assert abs(float(np.asarray(j_metrics["d_total"]))
               - t_metrics["d_total"]) > 1e-3
