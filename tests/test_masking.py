"""Property tests for the on-device masking ops — the schedules are the
scientific core of X-LXMERT (SURVEY.md §7 hard parts), so they get
distribution-level checks against the reference semantics
(lxmert_data.py:391-463,697-724)."""
import jax
import jax.numpy as jnp
import numpy as np

from xlxmert_tpu.ops.masking import (
    bernoulli_vis_mask, random_word_mask, square_vis_mask,
    uniform_count_vis_mask,
)


def test_random_word_mask_protections_and_rate():
    rng = jax.random.PRNGKey(0)
    B, L = 512, 20
    ids = np.full((B, L), 7, np.int32)
    ids[:, 0] = 101  # CLS
    ids[:, 15:] = 0  # pads
    masked, labels = random_word_mask(rng, jnp.asarray(ids), 0.15,
                                      vocab_size=100, mask_token_id=103)
    masked, labels = np.asarray(masked), np.asarray(labels)
    sel = labels >= 0
    # protections: CLS, last column, pads never masked
    assert not sel[:, 0].any()
    assert not sel[:, -1].any()
    assert not sel[:, 15:].any()
    # rate ~15% of eligible positions (cols 1..14)
    rate = sel[:, 1:15].mean()
    assert 0.10 < rate < 0.20
    # labels hold the original token at masked positions
    assert (labels[sel] == 7).all()
    # 80/10/10: of masked, ~80% are [MASK]
    frac_mask_tok = (masked[sel] == 103).mean()
    assert 0.7 < frac_mask_tok < 0.9
    # unmasked positions unchanged
    assert (masked[~sel] == ids[~sel]).all()


def test_uniform_count_vis_mask_distribution():
    rng = jax.random.PRNGKey(1)
    B, n = 4096, 64
    m = np.asarray(uniform_count_vis_mask(rng, B, n))
    counts = m.sum(axis=1).astype(int)
    assert counts.min() >= 1 and counts.max() <= n
    # counts should be ~uniform over 1..64 -> mean ~32.5
    assert abs(counts.mean() - 32.5) < 1.0
    # every value in {0,1}
    assert set(np.unique(m)) <= {0.0, 1.0}


def test_square_vis_mask_is_square():
    rng = jax.random.PRNGKey(2)
    B, G = 256, 8
    m = np.asarray(square_vis_mask(rng, B, G)).reshape(B, G, G)
    for i in range(B):
        rows = np.where(m[i].any(axis=1))[0]
        cols = np.where(m[i].any(axis=0))[0]
        h, w = len(rows), len(cols)
        assert h == w  # square
        # contiguous block
        assert (np.diff(rows) == 1).all() or h == 1
        assert (np.diff(cols) == 1).all() or w == 1
        assert m[i].sum() == h * w
    sizes = np.sqrt(m.reshape(B, -1).sum(axis=1)).astype(int)
    assert sizes.min() >= 1 and sizes.max() <= G


def test_bernoulli_vis_mask_rate():
    m = np.asarray(bernoulli_vis_mask(jax.random.PRNGKey(3), 2048, 64, 0.15))
    assert 0.13 < m.mean() < 0.17
