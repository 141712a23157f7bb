"""Odometry: Jacobian parity with the reference formulas, and scan-pair
convergence on synthetic motion-distorted sweeps."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu import frontend, odometry
from loam_tpu.ops import features, residuals
import oracles

CFG = dataclasses.replace(
    LoamConfig(),
    ring_width=1024,
    odom_y_scale=1.0,  # disable the VLP-16 empirical 1.05 for synthetic GT
)
# textbook-GN variant: fresh correspondence rows every iteration (no
# frame-lifetime accumulation, src/laserOdometry.cpp:458-459) and no
# upward-scan truncation quirk (:486,598) — the corrected-semantics mode
CFG_FRESH = dataclasses.replace(
    CFG, odom_accumulate_rows=False, emulate_upward_scan_truncation=False
)


def test_odom_jacobian_matches_reference_rows():
    rng = np.random.default_rng(7)
    transform = jnp.asarray(rng.uniform(-0.05, 0.05, 6).astype(np.float32))
    pts = rng.uniform(-10, 10, (32, 3)).astype(np.float32)
    cfs = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
    rows = np.asarray(
        residuals.odom_jacobian_rows(
            jnp.asarray(pts), jnp.asarray(cfs), transform
        )
    )
    for i in range(32):
        ref = oracles.odom_jacobian_row_ref(
            pts[i], cfs[i], np.asarray(transform)
        )
        np.testing.assert_allclose(rows[i], ref, rtol=1e-3, atol=1e-5)


def test_map_jacobian_matches_reference_rows():
    rng = np.random.default_rng(8)
    transform = jnp.asarray(rng.uniform(-0.3, 0.3, 6).astype(np.float32))
    pts = rng.uniform(-10, 10, (32, 3)).astype(np.float32)
    cfs = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
    rows = np.asarray(
        residuals.map_jacobian_rows(
            jnp.asarray(pts), jnp.asarray(cfs), transform
        )
    )
    for i in range(32):
        ref = oracles.map_jacobian_row_ref(pts[i], cfs[i], np.asarray(transform))
        np.testing.assert_allclose(rows[i], ref, rtol=1e-3, atol=1e-5)


def _run_sequence(deltas, seed=0, cfg=CFG):
    """Replay a sequence of sweeps along a piecewise-constant-twist
    trajectory.  deltas: per-sweep 6-pose increments (applied additively in
    this test's small-angle regime).  The first sweep is static so the
    odometry's world frame coincides with GT.  Returns (est_poses, gt)."""
    world = synth.make_world(seed=seed)
    poses = np.zeros((len(deltas) + 1, 6))
    for k, d in enumerate(deltas):
        poses[k + 1] = poses[k] + np.asarray(d)
    state = odometry.OdomState.create(cfg)
    est = []
    for k in range(len(deltas)):
        xyz, m = synth.simulate_sweep(
            world, poses[k], poses[k + 1], n_azimuth=900, seed=seed + k
        )
        sweep = frontend.ingest_sweep(jnp.asarray(xyz), jnp.asarray(m), cfg)
        fc = features.extract_features(sweep, cfg)
        state, out = odometry.odometry_step(state, fc, None, cfg)
        est.append(np.asarray(out.pose))
    return np.stack(est), poses


def test_tracking_translation():
    # static init sweep, then constant 1.0 m/s forward: the warm-started,
    # damped GN (the reference's -0.05 rhs scale) must lock on within a
    # few frames
    deltas = [np.zeros(6)] + [np.array([0, 0, 0, 0, 0, 0.10])] * 7
    est, gt = _run_sequence(deltas)
    # pose published for sweep k corresponds to GT pose at sweep end k+1
    # scan-to-scan LOAM carries a ~2 cm/frame error floor by design:
    # the damped step (0.05) under the 0.1 cm convergence break settles
    # just below 2 cm of remaining innovation; the mapping stage is the
    # accuracy layer (see test_mapping.py)
    err = est[-1][3:] - gt[-1][3:]
    assert np.linalg.norm(err) < 0.16, (est[-1], gt[-1])
    np.testing.assert_allclose(est[-1][:3], 0.0, atol=0.03)
    # velocity locked on: per-frame increments close to true motion
    steps = np.diff(est[2:, 5])
    assert np.all(np.abs(steps - 0.10) < 0.03), steps


def test_tracking_rotation_translation_fresh_rows():
    # textbook GN (fresh rows every iteration) converges tightly
    deltas = [np.zeros(6)] + [
        np.array([0, 0.02, 0, 0.01, 0, 0.08])
    ] * 7
    est, gt = _run_sequence(deltas, seed=2, cfg=CFG_FRESH)
    err_t = np.linalg.norm(est[-1][3:] - gt[-1][3:])
    err_r = abs(est[-1][1] - gt[-1][1])
    assert err_t < 0.22, (est[-1], gt[-1])
    # the absolute yaw error is dominated by the first frames' lock-on
    # transient; steady-state per-frame yaw must match the true rate
    assert err_r < 0.045, (est[-1], gt[-1])
    yaw_steps = np.diff(est[3:, 1])
    assert np.all(np.abs(yaw_steps - 0.02) < 0.006), yaw_steps


def test_tracking_rotation_translation_reference_mode():
    # reference row-accumulation semantics (src/laserOdometry.cpp:458-470):
    # early iterations' stale rows damp the solve, so lock-on is slower —
    # the very under-rotation the reference's 1.05 ry fudge compensates
    # (src/laserOdometry.cpp:832).  Steady-state per-frame yaw step must
    # still approach the true rate.
    deltas = [np.zeros(6)] + [
        np.array([0, 0.02, 0, 0.01, 0, 0.08])
    ] * 7
    est, gt = _run_sequence(deltas, seed=2)
    err_t = np.linalg.norm(est[-1][3:] - gt[-1][3:])
    err_r = abs(est[-1][1] - gt[-1][1])
    assert err_t < 0.25, (est[-1], gt[-1])
    assert err_r < 0.06, (est[-1], gt[-1])
    yaw_steps = np.diff(est[3:, 1])
    assert np.all(np.abs(yaw_steps - 0.02) < 0.01), yaw_steps
