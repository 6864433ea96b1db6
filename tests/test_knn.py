"""KNN oracle tests: brute-force numpy vs the tiled/streamed jnp implementation."""

import jax.numpy as jnp
import numpy as np

from svnicp_tpu.kernels import knn


def test_knn_candidates_matches_bruteforce(rng):
    ns, nt, k = 100, 537, 8
    src = rng.normal(size=(ns, 3)).astype(np.float32)
    tgt = rng.normal(size=(nt, 3)).astype(np.float32)
    idx, d2 = knn.knn_candidates(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(ns, bool), jnp.ones(nt, bool), k, chunk=64
    )
    full = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    ref_idx = np.argsort(full, axis=1, kind="stable")[:, :k]
    ref_d = np.take_along_axis(full, ref_idx, axis=1)
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), np.sort(ref_d, axis=1), rtol=1e-4, atol=1e-5)
    # index sets must match (order within ties may differ)
    got = np.asarray(idx)
    for i in range(ns):
        assert set(got[i]) == set(ref_idx[i]), i


def test_knn_candidates_respects_masks(rng):
    src = rng.normal(size=(10, 3)).astype(np.float32)
    tgt = rng.normal(size=(50, 3)).astype(np.float32)
    tgt_valid = np.zeros(50, bool)
    tgt_valid[:5] = True
    idx, d2 = knn.knn_candidates(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(10, bool), jnp.asarray(tgt_valid), 8
    )
    d2 = np.asarray(d2)
    # only 5 valid targets -> exactly 5 finite distances per row
    assert (np.isfinite(d2).sum(axis=1) == 5).all()
    assert (np.asarray(idx)[np.isfinite(d2)] < 5).all()
    # invalid sources -> all-inf rows
    idx2, d22 = knn.knn_candidates(
        jnp.asarray(src), jnp.asarray(tgt), jnp.zeros(10, bool), jnp.asarray(tgt_valid), 8
    )
    assert not np.isfinite(np.asarray(d22)).any()


def test_bucketed_includes_exact_nn(rng):
    ns, nt, k = 64, 4096, 32
    src = rng.normal(size=(ns, 3)).astype(np.float32) * 10
    tgt = rng.normal(size=(nt, 3)).astype(np.float32) * 10
    # hash-like shuffle so groups are spatially random (as in the pipeline)
    tgt = tgt[rng.permutation(nt)]
    idx, d2 = knn.knn_candidates_bucketed(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(ns, bool), jnp.ones(nt, bool), k
    )
    full = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    nn_idx = full.argmin(1)
    got = np.asarray(idx)
    for i in range(ns):
        # the exact global 1-NN is always among the candidates
        assert nn_idx[i] in got[i], i
    # distances are exact for selected candidates
    sel_d = np.take_along_axis(full, got, axis=1)
    np.testing.assert_allclose(np.asarray(d2), sel_d, rtol=1e-3, atol=1e-3)


def test_bucketed_respects_masks(rng):
    src = rng.normal(size=(10, 3)).astype(np.float32)
    tgt = rng.normal(size=(64, 3)).astype(np.float32)
    tv = np.zeros(64, bool)
    tv[:5] = True
    idx, d2 = knn.knn_candidates_bucketed(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(10, bool), jnp.asarray(tv), 8
    )
    d2 = np.asarray(d2)
    assert (np.asarray(idx)[np.isfinite(d2)] < 5).all()
    assert np.isfinite(d2).sum() > 0


def test_nn_among_candidates(rng):
    p, b, k = 4, 37, 9
    trans = rng.normal(size=(p, b, 3)).astype(np.float32)
    cand = rng.normal(size=(b, k, 3)).astype(np.float32)
    valid = rng.random((b, k)) > 0.3
    valid[:, 0] = True  # at least one valid candidate each
    idx, d2 = knn.nn_among_candidates(jnp.asarray(trans), jnp.asarray(cand), jnp.asarray(valid))
    full = ((trans[:, :, None, :] - cand[None, :, :, :]) ** 2).sum(-1)
    full[:, ~valid] = np.inf
    np.testing.assert_array_equal(np.asarray(idx), np.argmin(full, axis=-1))
    np.testing.assert_allclose(np.asarray(d2), np.min(full, axis=-1), rtol=1e-4, atol=1e-5)
