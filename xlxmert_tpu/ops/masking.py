"""On-device masking ops for pretraining and mask-predict.

The reference computes all masking on the host inside Dataset/collate
(lxmert_data.py:391-463 visual masks, :697-724 MLM 80/10/10). Here they are
jax.random ops that run inside the jitted train step — zero host work, fully
fused by XLA, reproducible from the step PRNG key.

Documented divergences from the reference (implementing intent, see
SURVEY.md §4 "reference bug triage"):
  - MLM labels use -1 as the ignore value, matching the data the reference
    produces (lxmert_data.py:708); its CrossEntropyLoss(ignore_index=-100)
    would actually crash on those labels. Our CE ignores all negatives.
  - Pad positions are never selected for MLM masking. The reference can
    turn a PAD into [MASK] and then attend to it (because the attention
    mask is recomputed from the masked ids at lxmert_pretrain.py:198).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_word_mask(
    rng: jax.Array,
    word_ids: jnp.ndarray,
    mask_rate: float = 0.15,
    vocab_size: int = 30522,
    mask_token_id: int = 103,
    pad_token_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BERT-style 80/10/10 MLM masking (reference lxmert_data.py:697-724).

    Position 0 ([CLS]) and the last column are protected, as in the
    reference; pad positions are additionally protected (see divergences).

    Returns (masked_ids, labels) where labels == -1 at unmasked positions.
    """
    B, L = word_ids.shape
    r_select, r_replace, r_rand, r_words = jax.random.split(rng, 4)

    selected = jax.random.uniform(r_select, (B, L)) < mask_rate
    col = jnp.arange(L)[None, :]
    protected = (col == 0) | (col == L - 1) | (word_ids == pad_token_id)
    selected = selected & ~protected

    labels = jnp.where(selected, word_ids, -1)

    use_mask_tok = jax.random.uniform(r_replace, (B, L)) < 0.8
    use_random = (~use_mask_tok) & (jax.random.uniform(r_rand, (B, L)) < 0.5)
    random_words = jax.random.randint(r_words, (B, L), 0, vocab_size)

    masked = jnp.where(selected & use_mask_tok, mask_token_id, word_ids)
    masked = jnp.where(selected & use_random, random_words, masked)
    return masked, labels


def uniform_count_vis_mask(rng: jax.Array, batch: int, n_cells: int) -> jnp.ndarray:
    """Mask-predict pretraining mask (reference lxmert_data.py:403-419):
    per sample draw n ~ U{1..n_cells}, then mask a uniform random subset of
    exactly n cells. Returns float32 (batch, n_cells) in {0, 1}.

    Implemented rank-threshold style: rank cells by iid noise and mask the
    first n — identical in distribution to np.random.choice without
    replacement, but shape-static and XLA-friendly.
    """
    r_count, r_noise = jax.random.split(rng)
    n = jax.random.randint(r_count, (batch, 1), 1, n_cells + 1)
    noise = jax.random.uniform(r_noise, (batch, n_cells))
    ranks = jnp.argsort(jnp.argsort(noise, axis=-1), axis=-1)
    return (ranks < n).astype(jnp.float32)


def square_vis_mask(rng: jax.Array, batch: int, grid_size: int) -> jnp.ndarray:
    """Square-region mask (reference lxmert_data.py:391-401): per sample a
    random s ~ U{1..G} square at a random position. Returns (batch, G*G)."""
    r_size, r_h, r_w = jax.random.split(rng, 3)
    s = jax.random.randint(r_size, (batch, 1, 1), 1, grid_size + 1)
    # top-left uniform over the valid range [0, G - s]; use floor(u * (G-s+1))
    u_h = jax.random.uniform(r_h, (batch, 1, 1))
    u_w = jax.random.uniform(r_w, (batch, 1, 1))
    h0 = jnp.floor(u_h * (grid_size - s + 1)).astype(jnp.int32)
    w0 = jnp.floor(u_w * (grid_size - s + 1)).astype(jnp.int32)
    rows = jnp.arange(grid_size)[None, :, None]
    cols = jnp.arange(grid_size)[None, None, :]
    inside = ((rows >= h0) & (rows < h0 + s) & (cols >= w0) & (cols < w0 + s))
    return inside.reshape(batch, grid_size * grid_size).astype(jnp.float32)


def bernoulli_vis_mask(rng: jax.Array, batch: int, n_cells: int,
                       rate: float = 0.15) -> jnp.ndarray:
    """Plain per-cell Bernoulli mask (reference lxmert_data.py:451-463)."""
    return jax.random.bernoulli(rng, rate, (batch, n_cells)).astype(jnp.float32)
