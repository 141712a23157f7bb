"""Pallas k-select kernel parity: interpreter mode vs the jnp reference
(the kernel runs compiled on real TPU; tests exercise the same code path
via the Pallas interpreter on CPU)."""

import numpy as np
import jax.numpy as jnp

from loam_tpu.ops.pallas.kselect import knn_select, knn_select_reference


def _case(Q, C, K, seed=0, frac_valid=0.7):
    rng = np.random.default_rng(seed)
    cand = jnp.asarray(rng.normal(size=(Q, C, 3)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(Q, C)) < frac_valid)
    q = jnp.asarray(rng.normal(size=(Q, 3)).astype(np.float32))
    return cand, valid, q


def test_kselect_matches_reference_interpret():
    cand, valid, q = _case(64, 96, 5)
    pts_p, d2_p = knn_select(cand, valid, q, 5, tile_q=32, interpret=True)
    pts_r, d2_r = knn_select_reference(cand, valid, q, 5)
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts_p), np.asarray(pts_r), atol=1e-5)


def test_kselect_few_valid_candidates():
    """Queries with fewer than k valid candidates pad with BIG distances."""
    cand, valid, q = _case(16, 32, 8, frac_valid=0.1)
    pts_p, d2_p = knn_select(cand, valid, q, 8, tile_q=16, interpret=True)
    _, d2_r = knn_select_reference(cand, valid, q, 8)
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_r), atol=1e-5)
    nv = np.asarray(valid.sum(1))
    d2 = np.asarray(d2_p)
    for i in range(16):
        assert (d2[i, nv[i]:] >= 1e29).all()


def test_kselect_unaligned_shapes():
    """Q and C not multiples of the tile/lane sizes."""
    cand, valid, q = _case(37, 130, 3, seed=3)
    pts_p, d2_p = knn_select(cand, valid, q, 3, tile_q=32, interpret=True)
    pts_r, d2_r = knn_select_reference(cand, valid, q, 3)
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts_p), np.asarray(pts_r), atol=1e-5)
