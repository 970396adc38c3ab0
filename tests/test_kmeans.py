"""k-means correctness: cluster recovery on synthetic blobs, inertia
monotonicity, assignment vs brute-force numpy, chunked-vs-oneshot Lloyd
parity."""
import numpy as np
import jax.numpy as jnp

from xlxmert_tpu.vocab.kmeans import (
    assign, centroid_filename, kmeans, lloyd_step, lloyd_step_chunked,
)


def blobs(n_per=200, k=5, d=16, seed=0, spread=0.05):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 3
    pts = np.concatenate([
        centers[i] + rng.randn(n_per, d) * spread for i in range(k)])
    labels = np.repeat(np.arange(k), n_per)
    perm = rng.permutation(len(pts))
    return pts[perm].astype(np.float32), labels[perm], centers


def test_assign_matches_bruteforce():
    rng = np.random.RandomState(1)
    x = rng.randn(100, 8).astype(np.float32)
    c = rng.randn(7, 8).astype(np.float32)
    ids = assign(x, c)
    ref = np.argmin(((x[:, None] - c[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(ids, ref)


def test_kmeans_recovers_blobs():
    x, labels, _ = blobs()
    centroids, final = kmeans(x, k=5, n_iter=15, seed=3)
    # cluster purity: every true blob maps to one dominant predicted id
    for b in range(5):
        pred = final[labels == b]
        dominant = np.bincount(pred).max() / len(pred)
        assert dominant > 0.99


def test_lloyd_inertia_decreases():
    x, _, _ = blobs(spread=1.0)
    rng = np.random.RandomState(0)
    c = jnp.asarray(x[rng.choice(len(x), 5, replace=False)])
    inertias = []
    xj = jnp.asarray(x)
    for _ in range(8):
        c, inertia = lloyd_step(xj, c, 5)
        inertias.append(float(inertia))
    assert inertias[-1] <= inertias[0]
    # non-increasing within float tolerance
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a + 1e-4


def test_empty_cluster_kept():
    x = np.zeros((10, 4), np.float32)
    c0 = np.stack([np.zeros(4), np.full(4, 100.0)]).astype(np.float32)
    c1, _ = lloyd_step(jnp.asarray(x), jnp.asarray(c0), 2)
    np.testing.assert_array_equal(np.asarray(c1)[1], c0[1])


def test_chunked_lloyd_matches_oneshot():
    """lloyd_step_chunked (scan over row tiles + pad weights) must equal
    the one-shot lloyd_step on the real rows — same fp32 accumulation."""
    x, _, _ = blobs(n_per=70, k=4, d=12, spread=1.0)  # 280 rows
    rng = np.random.RandomState(2)
    c0 = x[rng.choice(len(x), 4, replace=False)]
    ref_c, ref_in = lloyd_step(jnp.asarray(x), jnp.asarray(c0), 4)

    # chunk=64 does not divide 280 -> exercises the pad/weight path
    pad = (-len(x)) % 64
    xp = np.concatenate([x, np.zeros((pad, x.shape[1]), np.float32)])
    w = np.concatenate([np.ones(len(x), np.float32),
                        np.zeros(pad, np.float32)])
    ch_c, ch_in = lloyd_step_chunked(
        jnp.asarray(xp), jnp.asarray(w), jnp.asarray(c0), 4, 64)
    np.testing.assert_allclose(np.asarray(ch_c), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(ch_in), float(ref_in), rtol=1e-5)


def test_kmeans_chunked_recovers_blobs():
    """Full kmeans() through the chunked path (forced chunk + bf16
    storage) still recovers the blob structure."""
    x, labels, _ = blobs()
    _, final = kmeans(x, k=5, n_iter=15, seed=3, chunk=128,
                      store_dtype="bfloat16")
    for b in range(5):
        pred = final[labels == b]
        dominant = np.bincount(pred).max() / len(pred)
        assert dominant > 0.99


def test_centroid_filename_contract():
    assert centroid_filename("maskrcnn", "mscoco_train", 10000, 20, 2048, 8) == \
        "maskrcnn_mscoco_train_centroids10000_iter20_d2048_grid8.npy"
