"""k-means correctness: cluster recovery on synthetic blobs, inertia
monotonicity, assignment vs brute-force numpy."""
import numpy as np
import jax.numpy as jnp

from xlxmert_tpu.vocab.kmeans import assign, centroid_filename, kmeans, lloyd_step


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


def test_centroid_filename_contract():
    assert centroid_filename("maskrcnn", "mscoco_train", 10000, 20, 2048, 8) == \
        "maskrcnn_mscoco_train_centroids10000_iter20_d2048_grid8.npy"
