"""End-to-end golden parity: the composed TPU pipeline vs the NumPy
transcription of all four reference nodes (tests/golden/*).

BASELINE.md's north star is trajectory ATE <= 5 cm vs the reference on
nsh_indoor_outdoor; with no bags in this container, the golden oracle is
the stand-in reference.  This gate replays a 100-frame synthetic sequence
through both systems and bounds the ATE between them at every stage —
odometry (scan-to-scan), aft-mapped, and the integrated 10 Hz output.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu import metrics, pipeline

from golden.pipeline import run_pipeline

F = 100
N_AZIMUTH = 600

# the 100-frame gate runs the bounded-memory cell-bucket mapping variant
# (CPU-affordable); the exact-kNN flagship path — strictly closer to the
# reference's per-iteration kd re-query — gets its own shorter gate below
CFG = dataclasses.replace(
    LoamConfig(),
    ring_width=1024,
    corner_table_size=1 << 15,
    surf_table_size=1 << 17,
    map_exact_knn=False,
)
CFG_EXACT = dataclasses.replace(
    LoamConfig(),
    ring_width=1024,
    corner_table_size=1 << 15,
    surf_table_size=1 << 17,
    max_corner_from_map=16384,
    max_surf_from_map=32768,
)


def _make_sequence(kind: str, seed: int = 7):
    world = synth.make_world(seed=seed)
    if kind == "straight":
        poses = synth.straight_trajectory(F, speed=0.9, yaw_rate=0.12)
    else:
        poses = synth.figure8_trajectory(F, speed=1.0)
    poses = np.vstack([poses[:1], poses])[: F + 1]
    sweeps = [
        synth.simulate_sweep(
            world, poses[k], poses[k + 1], n_azimuth=N_AZIMUTH, seed=seed + k
        )
        for k in range(F)
    ]
    raw = np.stack([s[0] for s in sweeps])
    msk = np.stack([s[1] for s in sweeps])
    return raw, msk, poses


@pytest.fixture(scope="module")
def straight_runs():
    raw, msk, poses = _make_sequence("straight")
    oracle = run_pipeline(raw, msk)
    outs = pipeline.replay_sweeps(jnp.asarray(raw), jnp.asarray(msk), CFG)
    return oracle, outs, poses


def test_odometry_parity(straight_runs):
    """Scan-to-scan odometry trajectory pins to the reference transcription
    (src/laserOdometry.cpp:357-938) within millimetres over 100 frames."""
    oracle, outs, _ = straight_runs
    est = np.asarray(outs.pose_odom)[:, 3:6]
    ref = oracle["odom"][:, 3:6]
    ate = metrics.ate_rmse(est, ref)
    assert ate < 0.01, f"odometry ATE vs oracle {100 * ate:.2f} cm"


def test_integrated_parity_north_star(straight_runs):
    """The BASELINE.md north-star gate: integrated (10 Hz output)
    trajectory within 5 cm ATE of the composed reference transcription
    over 100 frames."""
    oracle, outs, _ = straight_runs
    est = np.asarray(outs.pose_integrated)[:, 3:6]
    ref = oracle["integrated"][:, 3:6]
    ate = metrics.ate_rmse(est, ref)
    per_frame = np.linalg.norm(est - ref, axis=1)
    assert ate < 0.05, (
        f"integrated ATE vs oracle {100 * ate:.2f} cm; "
        f"worst frame {100 * per_frame.max():.2f} cm"
    )


def test_aft_mapped_parity(straight_runs):
    """The 5 Hz aft-mapped pose stream also holds the 5 cm budget."""
    oracle, outs, _ = straight_runs
    est = np.asarray(outs.pose_aft)[:, 3:6]
    ref = oracle["aft"][:, 3:6]
    ate = metrics.ate_rmse(est, ref)
    assert ate < 0.05, f"aft-mapped ATE vs oracle {100 * ate:.2f} cm"


def test_mapping_cadence_parity(straight_runs):
    """Mapping consumes exactly the reference's frames: every 2nd sweep
    after the init frame (skipFrameNum=1, src/laserOdometry.cpp:51,886),
    with no mapping on the init frame (no odometry pose is published
    there, src/laserOdometry.cpp:427-456)."""
    oracle, outs, _ = straight_runs
    assert np.array_equal(np.asarray(outs.mapped), oracle["mapped"])


def test_exact_knn_parity_short(straight_runs):
    """The exact-kNN mapping path (per-iteration re-query, the
    reference's own semantics at src/laserMapping.cpp:717,824) holds the
    same gate over the first 30 frames."""
    oracle, _, _ = straight_runs
    raw, msk, _ = _make_sequence("straight")
    outs = pipeline.replay_sweeps(
        jnp.asarray(raw[:30]), jnp.asarray(msk[:30]), CFG_EXACT
    )
    est = np.asarray(outs.pose_integrated)[:, 3:6]
    ref = oracle["integrated"][:30, 3:6]
    ate = metrics.ate_rmse(est, ref)
    assert ate < 0.05, f"exact-kNN integrated ATE vs oracle {100*ate:.2f} cm"


def test_exact_knn_hybrid_parity(straight_runs):
    """The hybrid exact-kNN cadence (map_exact_regather_every=5 — the
    TPU fast mode: fused-kernel candidate gather per round,
    per-iteration re-rank) must hold the SAME 5 cm oracle gate as the
    strict per-iteration re-query.  This is the accuracy half of the
    bench A/B for that knob (config.py)."""
    oracle, _, _ = straight_runs
    raw, msk, _ = _make_sequence("straight")
    cfg = dataclasses.replace(CFG_EXACT, map_exact_regather_every=5)
    outs = pipeline.replay_sweeps(
        jnp.asarray(raw[:30]), jnp.asarray(msk[:30]), cfg
    )
    est = np.asarray(outs.pose_integrated)[:, 3:6]
    ref = oracle["integrated"][:30, 3:6]
    ate = metrics.ate_rmse(est, ref)
    assert ate < 0.05, f"hybrid integrated ATE vs oracle {100*ate:.2f} cm"


def test_full_density_parity():
    """Full VLP-16 per-sweep load (VERDICT r4 #1): ring_width=2048 with
    1800-azimuth sweeps (~28k raw points — the envelope's actual
    workload, src/scanRegistration.cpp:63-66) through the flagship
    exact-kNN path with reference-default knobs, vs the oracle on the
    SAME sweeps.  Short (12 frames) to stay CPU-affordable; the
    half-density 100-frame gates above cover the long-horizon behavior.
    """
    Ff = 12
    world = synth.make_world(seed=21)
    poses = synth.straight_trajectory(Ff, speed=0.9, yaw_rate=0.1)
    poses = np.vstack([poses[:1], poses])[: Ff + 1]
    sweeps = [
        synth.simulate_sweep(
            world, poses[k], poses[k + 1], n_azimuth=1800, seed=21 + k
        )
        for k in range(Ff)
    ]
    raw = np.stack([s[0] for s in sweeps])
    msk = np.stack([s[1] for s in sweeps])
    cfg = dataclasses.replace(
        LoamConfig(),  # ring_width 2048, y_scale 1.05, weight_start 5
        corner_table_size=1 << 15,
        surf_table_size=1 << 17,
        max_corner_from_map=16384,
        max_surf_from_map=32768,
    )
    assert cfg.ring_width == 2048
    oracle = run_pipeline(raw, msk)
    outs = pipeline.replay_sweeps(jnp.asarray(raw), jnp.asarray(msk), cfg)
    est = np.asarray(outs.pose_integrated)[:, 3:6]
    ref = oracle["integrated"][:, 3:6]
    ate = metrics.ate_rmse(est, ref)
    assert ate < 0.05, (
        f"full-density integrated ATE vs oracle {100 * ate:.2f} cm"
    )


def test_rotation_parity(straight_runs):
    """Yaw (the dominant rotation) stays within 0.2 deg of the oracle."""
    oracle, outs, _ = straight_runs
    yaw_err = np.abs(
        np.asarray(outs.pose_integrated)[:, 1] - oracle["integrated"][:, 1]
    )
    assert yaw_err.max() < np.radians(0.2), (
        f"max yaw divergence {np.degrees(yaw_err.max()):.3f} deg"
    )
