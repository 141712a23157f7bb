"""Interpreter-mode parity tests for the TPU-path Pallas kernels.

The fused kNN top-k (ops/pallas/knn_topk.py) and odometry correspondence
search (ops/pallas/odom_corr.py) dispatch only when
jax.default_backend() == "tpu", so the CPU suite would otherwise never
execute them.  Here they run via pallas_call(interpret=True) and are
pinned against knn_topk_reference and the jnp break-bounded walks in
loam_tpu.odometry (themselves pinned to the golden oracle), including the
empty-candidate cases: j1 = 0 with an immediate upward ring break, padded
tails, and all-ineligible tiles (the pre-fix _merge garbage-index bug).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loam_tpu.config import LoamConfig
from loam_tpu.odometry import _corner_correspondences, _surf_correspondences
from loam_tpu.ops.pallas.knn_topk import knn_topk, knn_topk_reference
from loam_tpu.ops.pallas.odom_corr import odom_correspondences
from loam_tpu.types import PointCloud


def _random_ring_cloud(rng, m, n_valid, n_rings=16, spread=8.0):
    """Ring-sorted reference cloud (the layout the walks assume)."""
    rings = np.sort(rng.integers(0, n_rings, size=n_valid))
    xyz = rng.uniform(-spread, spread, size=(m, 3)).astype(np.float32)
    # padding slots sit at the origin (what a compacted cloud leaves)
    xyz[n_valid:] = 0.0
    rel = np.zeros(m, np.float32)
    rel[:n_valid] = rings + 0.1 * rng.uniform(0.0, 0.9, size=n_valid)
    mask = np.arange(m) < n_valid
    return PointCloud(
        xyz=jnp.asarray(xyz), rel=jnp.asarray(rel), mask=jnp.asarray(mask)
    )


def _queries_near(rng, cloud, q, n_valid_ref, jitter=0.05):
    pick = rng.integers(0, n_valid_ref, size=q)
    base = np.asarray(cloud.xyz)[pick]
    qxyz = base + rng.normal(0.0, jitter, size=(q, 3)).astype(np.float32)
    return jnp.asarray(qxyz.astype(np.float32))


@pytest.mark.parametrize("surf", [False, True])
def test_corr_interpret_matches_jnp_walks(surf):
    cfg = LoamConfig()
    rng = np.random.default_rng(0)
    Q, M, NV = 64, 256, 230
    last = _random_ring_cloud(rng, M, NV)
    proj = _queries_near(rng, last, Q, NV)
    q_mask = jnp.arange(Q) < Q - 4          # a few masked query slots
    n_q = jnp.int32(Q - 4)

    if surf:
        j1r, j2r, j3r = _surf_correspondences(
            proj, q_mask, last, n_q, cfg
        )
        j1, j2, j3 = odom_correspondences(
            proj, q_mask, last.xyz, last.mask, last.ring(), n_q,
            cfg.odom_nn_gate_sq, cfg.ring_window,
            cfg.emulate_upward_scan_truncation, surf=True, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(j3), np.asarray(j3r))
    else:
        j1r, j2r = _corner_correspondences(proj, q_mask, last, n_q, cfg)
        j1, j2 = odom_correspondences(
            proj, q_mask, last.xyz, last.mask, last.ring(), n_q,
            cfg.odom_nn_gate_sq, cfg.ring_window,
            cfg.emulate_upward_scan_truncation, surf=False, interpret=True,
        )
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j1r))
    np.testing.assert_array_equal(np.asarray(j2), np.asarray(j2r))


@pytest.mark.parametrize("surf", [False, True])
def test_corr_empty_candidates_return_minus_one(surf):
    """j1 at index 0, immediate upward ring break, empty downward side:
    the reference leaves minPointInd2 = -1.  Pre-fix, _merge turned the
    all-ineligible tiles into a garbage index pointing at the origin
    padding, which then passed the 25 m^2 gate for queries near the
    origin (advisor finding, round 2)."""
    cfg = LoamConfig()
    M = 128
    xyz = np.zeros((M, 3), np.float32)
    rel = np.zeros(M, np.float32)
    # slot 0: ring 0 near the origin = the 1-NN; slots 1..127: ring 10
    # (beyond the +-2.5 window -> immediate upward break at index 1), ALL
    # VALID and within 5 m of the query — so the pre-fix garbage index
    # (tile_base + tm - 1 = 127) hits a valid, gate-passing slot that only
    # the _merge eligibility fix (not the caller's ref_mask gate) rejects.
    xyz[0] = (0.2, 0.0, 0.0)
    rel[0] = 0.05
    xyz[1:] = np.linspace(1.0, 2.0, M - 1)[:, None] * np.array([0, 1.0, 0])
    rel[1:] = 10.0
    mask = np.ones(M, bool)
    last = PointCloud(
        xyz=jnp.asarray(xyz), rel=jnp.asarray(rel), mask=jnp.asarray(mask)
    )
    proj = jnp.asarray([[0.1, 0.0, 0.0]] * 8, jnp.float32)
    q_mask = jnp.ones(8, bool)
    n_q = jnp.int32(8)

    out = odom_correspondences(
        proj, q_mask, last.xyz, last.mask, last.ring(), n_q,
        cfg.odom_nn_gate_sq, cfg.ring_window,
        cfg.emulate_upward_scan_truncation, surf=surf, interpret=True,
    )
    j1, j2 = out[0], out[1]
    np.testing.assert_array_equal(np.asarray(j1), np.zeros(8, np.int32))
    assert np.all(np.asarray(j2) == -1)
    if surf:
        # the corner-eligibility 3rd point (ring > cr upward) is also cut
        # by the same immediate break
        assert np.all(np.asarray(out[2]) == -1)
    # jnp walks agree
    if surf:
        _, j2r, j3r = _surf_correspondences(proj, q_mask, last, n_q, cfg)
        assert np.all(np.asarray(j3r) == -1)
    else:
        _, j2r = _corner_correspondences(proj, q_mask, last, n_q, cfg)
    assert np.all(np.asarray(j2r) == -1)


def test_corr_all_padding_reference():
    """Fully masked reference cloud: every output is -1 (no garbage from
    the all-BIG tiles)."""
    cfg = LoamConfig()
    M, Q = 128, 8
    last = PointCloud.zeros(M)
    proj = jnp.zeros((Q, 3), jnp.float32)
    j1, j2, j3 = odom_correspondences(
        proj, jnp.ones(Q, bool), last.xyz, last.mask, last.ring(),
        jnp.int32(Q), cfg.odom_nn_gate_sq, cfg.ring_window,
        cfg.emulate_upward_scan_truncation, surf=True, interpret=True,
    )
    for j in (j1, j2, j3):
        assert np.all(np.asarray(j) == -1)


def test_knn_topk_interpret_matches_reference():
    rng = np.random.default_rng(1)
    Q, M, K = 64, 256, 5
    ref = rng.uniform(-5.0, 5.0, size=(M, 3)).astype(np.float32)
    ref[200:] = 0.0
    ref_mask = jnp.arange(M) < 200
    q = rng.uniform(-5.0, 5.0, size=(Q, 3)).astype(np.float32)

    idx, d2 = knn_topk(
        jnp.asarray(q), None, jnp.asarray(ref), ref_mask, K,
        tq=Q, tm=M, interpret=True,
    )
    idx_r, d2_r = knn_topk_reference(
        jnp.asarray(q), None, jnp.asarray(ref), ref_mask, K
    )
    # compare exact recomputed distances (the kernel's packed keys
    # truncate mantissas; the neighbor SET is the contract)
    def exact(i):
        p = ref[np.clip(np.asarray(i), 0, M - 1)]
        d = q[:, None, :] - p
        return np.sort((d * d).sum(-1), axis=1)

    np.testing.assert_allclose(exact(idx), exact(idx_r), rtol=1e-5)
    # masked slots never selected
    assert np.all(np.asarray(idx) < 200)


def test_knn_topk_interpret_all_masked():
    Q, M, K = 8, 128, 5
    q = jnp.zeros((Q, 3), jnp.float32)
    ref = jnp.zeros((M, 3), jnp.float32)
    _, d2 = knn_topk(
        q, None, ref, jnp.zeros(M, bool), K, tq=Q, tm=M, interpret=True
    )
    assert np.all(np.asarray(d2) > 1e28)


def test_knn_topk_dyn_interpret_matches_reference():
    """Whole-problem kernel (dynamic query-block + ref-tile loops) against
    the jnp reference: live rows match, dead query rows stay BIG."""
    from loam_tpu.ops.pallas.knn_topk import knn_topk_dyn

    rng = np.random.default_rng(7)
    Q, M, K = 128, 512, 5
    n_q, n_ref = 70, 300  # neither a multiple of the tile sizes
    ref = rng.uniform(-5.0, 5.0, size=(M, 3)).astype(np.float32)
    ref[n_ref:] = 0.0
    ref_mask = jnp.arange(M) < n_ref
    q = rng.uniform(-5.0, 5.0, size=(Q, 3)).astype(np.float32)

    idx, d2 = knn_topk_dyn(
        jnp.asarray(q), jnp.asarray(ref), ref_mask,
        jnp.int32(n_q), jnp.int32(n_ref), K, tq=32, tm=128,
        interpret=True,
    )
    idx_r, _ = knn_topk_reference(
        jnp.asarray(q), None, jnp.asarray(ref), ref_mask, K
    )

    def exact(i):
        p = ref[np.clip(np.asarray(i), 0, M - 1)]
        d = q[:, None, :] - p
        return np.sort((d * d).sum(-1), axis=1)

    np.testing.assert_allclose(
        exact(idx)[:n_q], exact(idx_r)[:n_q], rtol=1e-5
    )
    assert np.all(np.asarray(idx)[:n_q] < n_ref)
    # rows past the last touched query BLOCK keep the BIG pre-fill (the
    # partial block covering n_q is computed whole; callers gate by mask)
    blk_end = -(-n_q // 32) * 32
    assert np.all(np.asarray(d2)[blk_end:] > 1e28)


def test_knn_topk_dyn_interpret_empty_ref():
    from loam_tpu.ops.pallas.knn_topk import knn_topk_dyn

    Q, M, K = 32, 128, 5
    q = jnp.zeros((Q, 3), jnp.float32)
    ref = jnp.zeros((M, 3), jnp.float32)
    _, d2 = knn_topk_dyn(
        q, ref, jnp.zeros(M, bool), jnp.int32(Q), jnp.int32(0), K,
        tq=32, tm=128, interpret=True,
    )
    assert np.all(np.asarray(d2) > 1e28)
