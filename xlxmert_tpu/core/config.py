"""Typed configuration for the TPU-native X-LXMERT framework.

Mirrors the live surface of the reference flag systems:
  - /root/reference/x-lxmert/src/param.py:61-307   (transformer side, ~90 flags)
  - /root/reference/image_generator/src/configs.py:15-164 (GAN side)

The reference consumes several flags it never defines (`fp16`, `weight_decay`,
`warmp_ratio`, `num_clusters` — see SURVEY.md §4); here every consumed knob is
defined, typed, and defaulted to the canonical `pretrain.bash` recipe
(/root/reference/x-lxmert/scripts/pretrain.bash:11-30).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import yaml


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


class _YamlMixin:
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(_asdict(self), f, default_flow_style=False)

    @classmethod
    def from_yaml(cls, path: str):
        # NOT named `load`: several config classes have a `load: str`
        # FIELD (the reference's --load flag), which would shadow a
        # classmethod of that name and break it for exactly those classes
        with open(path) as f:
            d = yaml.safe_load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class LxmertConfig(_YamlMixin):
    """LXMERT backbone shape.

    Matches HF `LxmertConfig` defaults (transformers configuration_lxmert.py)
    and the reference recipe (param.py:107-112, pretrain.bash:19).
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    l_layers: int = 9
    x_layers: int = 5
    r_layers: int = 5
    visual_feat_dim: int = 2048
    visual_pos_dim: int = 4
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    num_qa_labels: int = 9500
    num_object_labels: int = 1600
    num_attr_labels: int = 400
    # Visual vocabulary (faiss-kmeans equivalent): reference param.py:167-169.
    num_clusters: int = 10000

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def clustering(self) -> bool:
        return self.num_clusters > 0


@dataclass(frozen=True)
class TrainConfig(_YamlMixin):
    """Shared trainer knobs (param.py:61-279; defaults = pretrain.bash recipe)."""

    # optimization
    optim: str = "adamw"
    lr: float = 1e-4
    batch_size: int = 256
    epochs: int = 20
    warmup_ratio: float = 0.05
    weight_decay: float = 0.01
    clip_grad_norm: float = 1.0
    adam_eps: float = 1e-6
    update_freq: int = 1  # gradient accumulation (tasks/vqa.py:152-159)
    seed: int = 9595

    # precision: bf16 on TPU replaces AMP/apex (lxmert_pretrain.py:23-34)
    mixed_precision: bool = True

    # PRNG implementation for the training step's random streams
    # (dropout, on-device masking). "rbg" is measured 8-10% faster per
    # train step than the threefry2x32 default on v5e (dropout-bit
    # generation is VPU-bound; ablation in scripts/drive_pretrain.py
    # --rng_impl/--no_dropout) and is statistically equivalent for
    # dropout/masking. Use "threefry2x32" for jax-default streams.
    rng_impl: str = "rbg"

    # data
    train: str = "mscoco_train,mscoco_nominival,vgnococo"
    valid: str = "mscoco_minival"
    max_text_length: int = 20
    train_topk: int = -1
    valid_topk: int = -1
    num_workers: int = 4

    # visual input geometry (param.py:145-147)
    grid_model: bool = True
    grid_size: int = 8
    feat_dim: int = 2048
    n_boxes: int = 36

    # clustering / visual vocab (param.py:163-177)
    clustering: bool = True
    num_clusters: int = 10000
    encoder: str = "maskrcnn"
    cluster_src: str = "mscoco_train"
    kmeans_iterations: int = 20

    # pretraining task mix (pretrain.bash:13-18)
    task_mask_lm: bool = True
    task_obj_predict: bool = True
    task_matched: bool = True
    task_qa: bool = False
    visual_losses: str = "obj"  # comma-sep from {obj, attr, feat}
    word_mask_rate: float = 0.15
    obj_mask_rate: float = 0.15
    vis_mask_predict: bool = True  # uniform-count mask-predict masking
    square_mask: bool = False
    vis_mask_COCO_only: bool = False
    vis_mask_COCOVG_only: bool = True
    # bbox (non-clustering) pretraining path (param.py:172-173,246-247):
    # obj CE labels = detector obj ids via the out_obj head; feat labels /
    # model input = exact h5 features. data_out wiring:
    # lxmert_pretrain.py:723-741.
    target_obj_id: bool = False
    feed_exact_feat: bool = False
    target_exact_feat: bool = False

    # io
    output: str = "snap/pretrain"
    load: Optional[str] = None
    load_lxmert: Optional[str] = None
    load_lxmert_qa: Optional[str] = None
    from_scratch: bool = False
    # bert-base-uncased torch weights (.bin/.pth) for the reference's
    # default language-stack initialization (lxmert_pretrain.py:58-61);
    # --fromScratch opts out, matching param.py:90-93.
    bert_weights: Optional[str] = None
    # also write Epoch%02d_FULL.msgpack (params + optimizer moments +
    # step) so --load resumes EXACTLY — Adam state and the LR-schedule
    # position survive. The reference (and our default Epoch%02d_LXRT
    # params file) rebuilds the optimizer on resume.
    save_full_state: bool = False
    comment: str = ""

    # distribution: 1-D data mesh over ICI (replaces NCCL DDP,
    # lxmert_pretrain.py:694-700). `mesh_shape` may add a model axis later.
    distributed: bool = True
    mesh_shape: Tuple[int, ...] = ()  # () -> all devices on the data axis
    mesh_axis_names: Tuple[str, ...] = ("data",)

    # debug / smoke (param.py:142-143,214,237)
    dry: bool = False
    debug: bool = False
    test_only: bool = False

    # on-host data paths
    data_root: str = "data"

    def __post_init__(self):
        if self.clustering and not self.grid_model:
            # cluster-id grids are grid_size^2 while the bbox path is
            # n_boxes visual tokens; the reference never mixes them (its
            # loader keys features on grid_model and cluster pkls on
            # clustering — lxmert_data.py:185-205 — and pretrain.bash
            # always passes both flags). Fail early instead of a shape
            # error inside the jitted step.
            raise ValueError(
                "clustering pretraining requires grid_model=True "
                "(--grid_model): cluster ids are grid_size^2 grids")
        if self.square_mask and not self.grid_model:
            # square_vis_mask draws a grid_size^2 square patch; with
            # n_boxes visual tokens the mask shape mismatches and dies
            # inside the jitted step. The reference's square mask is
            # grid-only too (lxmert_data.py:441-458 indexes a grid).
            raise ValueError(
                "--square_mask is a grid-pattern mask: it requires "
                "grid_model=True (use the bernoulli/uniform-count masks "
                "on the bbox path)")
        if self.target_obj_id and self.grid_model and not self.clustering:
            # grid h5 files carry no obj_id dataset — the reference
            # routes non-clustering grid_model runs to grid h5
            # (lxmert_data.py:186-193) and its obj_id read would
            # KeyError there just the same; fail with a message instead
            raise ValueError(
                "--target_obj_id needs detector obj ids, which only the "
                "bbox h5 provides: drop --grid_model or --target_obj_id")

    @property
    def n_grids(self) -> int:
        return self.grid_size ** 2

    @property
    def n_vis(self) -> int:
        """Visual tokens per image: grid cells, or n_boxes on the bbox
        path (reference lxmert_data.py:225-231)."""
        return self.grid_size ** 2 if self.grid_model else self.n_boxes

    @property
    def visual_loss_keys(self) -> Tuple[str, ...]:
        return tuple(k for k in self.visual_losses.split(",") if k)

    @property
    def mask_modalities(self) -> Tuple[str, ...]:
        """Task round-robin entries (lxmert_pretrain.py:777-805)."""
        out = []
        if self.task_obj_predict:
            out.append("vis_mask")
        if self.task_mask_lm:
            out.append("word_mask")
        if self.task_matched:
            out.append("matched")
        return tuple(out)


@dataclass(frozen=True)
class FinetuneConfig(TrainConfig):
    """VQA/GQA/NLVR2 finetuning (tasks/{vqa,gqa,nlvr2}.py __main__ defaults)."""

    task: str = "vqa"
    # serve eval/test prediction through the static-calibrated int8
    # engine (serving/lxmert_int8.py) — opt-in speed for dump runs
    serve_int8: bool = False
    lr: float = 5e-5
    epochs: int = 10
    batch_size: int = 32
    task_mask_lm: bool = False
    task_obj_predict: bool = False
    task_matched: bool = False
    task_qa: bool = True
    vis_mask_predict: bool = False
    train: str = "train,nominival"
    valid: str = "minival"
    test: Optional[str] = None


@dataclass(frozen=True)
class SampleConfig(_YamlMixin):
    """Text-to-image sampling (scripts/sample_images.sh + sample_images.py:27-104)."""

    grid_size: int = 8
    feat_dim: int = 2048
    num_clusters: int = 10000
    max_text_length: int = 20
    sample_steps: int = 4  # NAR mask-predict steps
    sample_mode: str = "NAR"  # NAR | AR
    # AR position strategy (imggen_model.py:49-167)
    position_strategy: str = "confidence"  # confidence | random | TLBR
    batch_size: int = 16
    seed: int = 9595
    load: Optional[str] = None
    centroids: Optional[str] = None
    generator: Optional[str] = None
    sentences_path: str = "example_sentences.txt"
    output: str = "samples"
    target_size: int = 256


@dataclass(frozen=True)
class GanConfig(_YamlMixin):
    """SPADE GAN generator training (configs.py:47-164, train_generator.bash:1-24)."""

    # model shape
    emb_dim: int = 2048
    codebook_dim: int = 256
    g_base_dim: int = 32
    d_base_dim: int = 64
    mod_dim: int = 128
    init_H: int = 8
    init_W: int = 8
    resize_target_size: int = 512
    target_size: int = 256
    extra_layers: int = 0
    norm_type: str = "spade_in"
    SN: bool = True
    ACGAN: bool = True
    n_classes: int = 10000

    # losses (configs.py:119-134)
    gan_loss_type: str = "hinge"
    lambda_adv: float = 1.0
    lambda_cls: float = 1.0  # ACGAN per-cell cluster CE
    lambda_feat: float = 10.0  # perceptual feature loss via encoder
    lambda_feat_match: float = 10.0  # discriminator feature matching
    perceptual_encoder: str = "resnet50"

    # optimization (main.py:145-232; Adam beta1=0)
    g_lr: float = 4e-4
    d_lr: float = 1e-4
    adam_beta1: float = 0.0
    adam_beta2: float = 0.999
    batch_size: int = 32
    epochs: int = 101
    seed: int = 9595
    mixed_precision: bool = True
    rng_impl: str = "rbg"  # see TrainConfig.rng_impl

    # data
    data_root: str = "data"
    cluster_src: str = "mscoco_train"
    num_workers: int = 4

    # io
    output: str = "snap/generator"
    load: Optional[str] = None


def apply_rng_impl(cfg) -> None:
    """Set jax's default PRNG implementation from cfg.rng_impl. Call
    before the first PRNGKey is created (the training CLIs do). rbg is
    measured 8-10% faster per train step than threefry2x32 on v5e —
    dropout bit generation is a real cost at these model sizes
    (ablation: scripts/drive_pretrain.py --no_dropout/--rng_impl)."""
    impl = getattr(cfg, "rng_impl", None)
    if impl:
        import jax

        jax.config.update("jax_default_prng_impl", impl)
        if impl != "threefry2x32":
            # reproducibility break vs jax-default streams: same seed,
            # different dropout/masking bits (README divergence log)
            print(f"PRNG impl: {impl} (non-default; pass --rng_impl "
                  "threefry2x32 for jax-default streams)", flush=True)
