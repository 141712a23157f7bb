"""Batched small-linalg vs numpy references."""

import numpy as np
import jax.numpy as jnp

from loam_tpu.utils import linalg


def test_eigh3x3_matches_numpy():
    rng = np.random.default_rng(0)
    B = rng.normal(size=(64, 3, 3))
    A = (B @ np.swapaxes(B, -1, -2)).astype(np.float32)
    w, V = linalg.eigh3x3(jnp.asarray(A))
    w = np.asarray(w)
    V = np.asarray(V)
    wn = np.linalg.eigvalsh(A)[:, ::-1]  # descending
    np.testing.assert_allclose(w, wn, rtol=1e-3, atol=1e-3)
    # each row of V is an eigenvector: A v = lambda v
    for k in range(3):
        av = np.einsum("bij,bj->bi", A, V[:, k, :])
        lv = w[:, k : k + 1] * V[:, k, :]
        np.testing.assert_allclose(av, lv, rtol=1e-2, atol=1e-2)


def test_solve3x3():
    rng = np.random.default_rng(1)
    M = rng.normal(size=(32, 3, 3)).astype(np.float32)
    M = M @ np.swapaxes(M, -1, -2) + 0.5 * np.eye(3, dtype=np.float32)
    b = rng.normal(size=(32, 3)).astype(np.float32)
    x = np.asarray(linalg.solve3x3(jnp.asarray(M), jnp.asarray(b)))
    xn = np.linalg.solve(M, b[..., None])[..., 0]
    np.testing.assert_allclose(x, xn, rtol=1e-3, atol=1e-3)


def test_fit_plane5():
    rng = np.random.default_rng(2)
    # points on the plane n.p = -d with noise-free sampling
    n = np.array([0.3, -0.5, 0.81])
    n = n / np.linalg.norm(n)
    d = 0.7
    basis = np.linalg.svd(n[None, :])[2][1:]  # 2 orthogonal in-plane dirs
    uv = rng.normal(size=(5, 2))
    pts = (uv @ basis - d * n).astype(np.float32)
    normal, dd = linalg.fit_plane5(jnp.asarray(pts)[None])
    normal = np.asarray(normal)[0]
    dd = float(np.asarray(dd)[0])
    if np.dot(normal, n) < 0:
        normal, dd = -normal, -dd
    np.testing.assert_allclose(normal, n, atol=1e-3)
    np.testing.assert_allclose(dd, d, atol=1e-3)
    # residuals ~ 0
    res = pts @ np.asarray(normal) + dd
    np.testing.assert_allclose(res, 0, atol=1e-3)


def test_degeneracy_projector():
    rng = np.random.default_rng(3)
    # well-conditioned: projector == identity, not degenerate
    Q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    w = np.array([500, 400, 300, 200, 150, 120], dtype=np.float32)
    A = (Q * w) @ Q.T
    P, degen = linalg.degeneracy_projector(jnp.asarray(A, jnp.float32), 10.0)
    assert not bool(degen)
    np.testing.assert_allclose(np.asarray(P), np.eye(6), atol=1e-3)
    # degenerate: one small eigenvalue gets projected out
    w2 = np.array([500, 400, 300, 200, 150, 1e-3], dtype=np.float32)
    A2 = (Q * w2) @ Q.T
    P2, degen2 = linalg.degeneracy_projector(jnp.asarray(A2, jnp.float32), 10.0)
    assert bool(degen2)
    v_small = Q[:, 5]
    np.testing.assert_allclose(np.asarray(P2) @ v_small, 0, atol=1e-2)
    v_big = Q[:, 0]
    np.testing.assert_allclose(np.asarray(P2) @ v_big, v_big, atol=1e-2)
