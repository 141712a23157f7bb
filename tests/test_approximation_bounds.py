"""Quantified bounds for the two DECLARED approximations (VERDICT r3 #6).

1. The voxel-hash map's EMA count cap (`map_store.table_insert`,
   cfg.voxel_count_cap) approximates PCL VoxelGrid's per-cube
   re-centroiding of old-centroid + new points
   (/root/reference/src/laserMapping.cpp:1018-1036).  Bound: trajectory
   sensitivity of the integrated pose to the cap value, including the
   effectively-uncapped limit.

2. The fused Pallas correspondence kernels select with
   mantissa-truncated packed keys, so within a ~2^-12 relative distance
   band ties can break differently than the reference's literal walk
   (PARITY.md "Documented TPU-only divergences").  Bound: on
   deliberately near-tie clouds, the kernel may pick different INDICES
   but the accepted neighbor DISTANCES must agree to the truncation
   band, so the GN residuals (what the solver consumes) are unchanged
   at solver precision.

Measured numbers are recorded in PARITY.md.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu import metrics, pipeline

F = 20
N_AZIMUTH = 420

BASE_CFG = dataclasses.replace(
    LoamConfig(),
    ring_width=512,
    corner_table_size=1 << 14,
    surf_table_size=1 << 15,
    search_buckets=1 << 12,
    max_corner_from_map=4096,
    max_surf_from_map=8192,
    map_exact_knn=False,
)


@pytest.fixture(scope="module")
def sequence():
    world = synth.make_world(seed=13)
    poses = synth.straight_trajectory(F, speed=0.9, yaw_rate=0.15)
    poses = np.vstack([poses[:1], poses])[: F + 1]
    sweeps = [
        synth.simulate_sweep(
            world, poses[k], poses[k + 1], n_azimuth=N_AZIMUTH, seed=13 + k
        )
        for k in range(F)
    ]
    raw = jnp.asarray(np.stack([s[0] for s in sweeps]))
    msk = jnp.asarray(np.stack([s[1] for s in sweeps]))
    return raw, msk, poses


def test_voxel_count_cap_trajectory_sensitivity(sequence):
    """Integrated-trajectory ATE between capped and UNCAPPED map
    aggregation stays within the golden-parity noise floor — the cap is
    a memory-bounding device, not an accuracy trade."""
    raw, msk, _ = sequence
    runs = {}
    for cap in (25.0, 100.0, 400.0, 1e9):
        cfg = dataclasses.replace(BASE_CFG, voxel_count_cap=cap)
        outs = pipeline.replay_sweeps(raw, msk, cfg)
        runs[cap] = np.asarray(outs.pose_integrated)[:, 3:6]

    ref = runs[1e9]  # effectively uncapped: every point keeps full weight
    worst = {}
    for cap in (25.0, 100.0, 400.0):
        ate = metrics.ate_rmse(runs[cap], ref)
        worst[cap] = ate
        assert ate < 0.02, (
            f"voxel_count_cap={cap}: {100 * ate:.2f} cm ATE vs uncapped"
        )
    # the production default (100) must sit well inside the band
    assert worst[100.0] < 0.01, worst


def test_knn_tiebreak_distance_band(sequence):
    """Near-tie 5-NN selection: the exact-kNN kernel (interpret mode,
    same selection logic as the TPU lowering) may order near-equal
    neighbors differently than a float64 argsort, but every selected
    distance agrees within the 2^-12 relative mantissa-truncation band
    — so residuals, weights and gates see equal inputs at f32 solver
    precision."""
    from loam_tpu.ops.pallas.knn_topk import knn_points

    rng = np.random.default_rng(5)
    # reference points in near-coincident shells around each query:
    # 8 candidates per query at radii differing by ~1e-5 relative
    Q, C = 128, 8
    q = rng.uniform(-5, 5, (Q, 3)).astype(np.float32)
    base_r = 0.5
    offs = rng.normal(size=(Q, C, 3))
    offs /= np.linalg.norm(offs, axis=-1, keepdims=True)
    radii = base_r * (1.0 + rng.uniform(-1e-5, 1e-5, (Q, C)))
    ref = (q[:, None, :] + offs * radii[..., None]).reshape(-1, 3)
    ref = np.ascontiguousarray(ref, np.float32)

    pts_k, d2_k = knn_points(
        jnp.asarray(q), None, jnp.asarray(ref),
        jnp.ones((ref.shape[0],), bool), 5,
    )
    d2_k = np.asarray(d2_k)

    # float64 exact 5-NN distances
    d2_exact = np.sum(
        (q[:, None, :].astype(np.float64) - ref[None].astype(np.float64))
        ** 2,
        axis=-1,
    )
    d2_ref = np.sort(d2_exact, axis=1)[:, :5]

    rel = np.abs(np.sqrt(d2_k) - np.sqrt(d2_ref)) / np.sqrt(d2_ref)
    assert rel.max() < 2 ** -11, (
        f"selected-neighbor distance band exceeded: {rel.max():.2e}"
    )


def _corr_divergence(ref, ring, q, cfg):
    """Run kernel (interpret) vs jnp walks; return (acceptance-agree,
    chosen-distance rel band, j2 index divergence rate)."""
    from loam_tpu.ops.pallas.odom_corr import odom_correspondences
    from loam_tpu.odometry import _corner_correspondences
    from loam_tpu.types import PointCloud

    order = np.argsort(ring, kind="stable")
    ref = np.ascontiguousarray(ref[order], np.float32)
    rel = (ring[order] + 0.05).astype(np.float32)
    last = PointCloud(
        xyz=jnp.asarray(ref), rel=jnp.asarray(rel),
        mask=jnp.ones((ref.shape[0],), bool),
    )
    qj = jnp.asarray(q.astype(np.float32))
    qm = jnp.ones((q.shape[0],), bool)
    nq = jnp.int32(q.shape[0])

    j1_w, j2_w = _corner_correspondences(qj, qm, last, nq, cfg)
    j1_k, j2_k = odom_correspondences(
        qj, qm, last.xyz, last.mask, last.ring(), nq,
        cfg.odom_nn_gate_sq, cfg.ring_window,
        cfg.emulate_upward_scan_truncation, surf=False, interpret=True,
    )
    j1_w, j1_k = np.asarray(j1_w), np.asarray(j1_k)
    j2_w, j2_k = np.asarray(j2_w), np.asarray(j2_k)
    ok_w, ok_k = j2_w >= 0, j2_k >= 0
    agree = np.array_equal(ok_w, ok_k) and np.array_equal(j1_w, j1_k)

    def d2_of(j):
        t = ref[np.clip(j, 0, None)]
        return np.sum((q.astype(np.float64) - t.astype(np.float64)) ** 2, -1)

    both = ok_w & ok_k
    # 1-NN distance band over all queries where either side found one
    found = (j1_w >= 0) & (j1_k >= 0)
    d1_w = np.sqrt(np.maximum(d2_of(j1_w)[found], 1e-30))
    d1_k = np.sqrt(np.maximum(d2_of(j1_k)[found], 1e-30))
    band1 = float(np.max(
        np.abs(d1_k - d1_w) / np.maximum(d1_w, 1e-12), initial=0.0
    ))
    # 2nd-point distance band conditioned on an AGREEING 1-NN (a
    # diverging tied 1-NN on another ring legitimately changes the
    # whole 2nd-point candidate set — that cascade is measured by
    # `cascade`, not banded)
    same1 = both & (j1_w == j1_k)
    d2_w = np.sqrt(np.maximum(d2_of(j2_w)[same1], 1e-30))
    d2_k = np.sqrt(np.maximum(d2_of(j2_k)[same1], 1e-30))
    band2 = float(np.max(
        np.abs(d2_k - d2_w) / np.maximum(d2_w, 1e-12), initial=0.0
    ))
    div = float(
        np.mean(((j2_w != j2_k) | (j1_w != j1_k))[both])
    ) if both.any() else 0.0
    cascade = float(np.mean((j1_w != j1_k)[found])) if found.any() else 0.0
    accept_div = float(np.mean(ok_w != ok_k))
    return agree, max(band1, band2), div, accept_div, cascade


def test_odom_corr_tiebreak_divergence_bounds():
    """Scan-to-scan correspondence, kernel (interpret) vs the jnp
    break-bounded walks.

    (a) ADVERSARIAL exact-tie cloud (mirrored point pairs, so both the
    1-NN and 2nd-point candidates come in exactly-equidistant pairs):
    picks MAY differ — that is the documented divergence — but every
    chosen distance matches the walk's choice within the 2^-12
    mantissa-truncation band (on exact ties: identical), so the gates
    and weights downstream see equal inputs.
    (b) REALISTIC cloud (random non-degenerate geometry): the picks
    themselves must be identical — the divergence has measure ~0 off
    the tie set."""
    cfg = BASE_CFG
    rng = np.random.default_rng(9)

    # (a) adversarial: mirrored pairs -> exact ties
    M, Qn = 512, 64
    base = rng.uniform(-4, 4, (M // 2, 3)).astype(np.float32)
    ref = np.concatenate([base + [0.01, 0, 0], base - [0.01, 0, 0]])
    ring = np.repeat(np.arange(16.0), M // 16)[:M]
    _, band, div, accept_div, cascade = _corr_divergence(
        ref, ring, base[:Qn], cfg
    )
    assert band < 2 ** -12, f"chosen-distance band exceeded: {band:.2e}"
    assert accept_div < 0.1, (
        f"acceptance diverged on {100 * accept_div:.0f}% of tie queries"
    )
    print(f"adversarial exact-tie: pick divergence {div:.3f}, "
          f"1-NN cascade {cascade:.3f}, acceptance {accept_div:.3f}, "
          f"distance band {band:.2e}")

    # (b) realistic: random cloud, no constructed ties
    M2 = 1024
    ref2 = rng.uniform(-6, 6, (M2, 3)).astype(np.float32)
    ring2 = np.repeat(np.arange(16.0), M2 // 16)[:M2]
    q2 = ref2[rng.choice(M2, 64, replace=False)] + rng.normal(
        0, 0.03, (64, 3)
    ).astype(np.float32)
    agree2, band2, div2, accept_div2, _ = _corr_divergence(
        ref2, ring2, q2, cfg
    )
    assert agree2 and accept_div2 == 0.0
    assert div2 == 0.0, (
        f"kernel diverged from the walk off the tie set: rate {div2:.3f}"
    )
    assert band2 == 0.0
