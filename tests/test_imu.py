"""IMU dead-reckoning, per-sweep interpolation, and deskew (C2/C3).

Reference behavior: src/scanRegistration.cpp:108-209 (integration +
start-frame transforms), :286-347 (per-point interpolation), :614-629
(imuTrans message), validated here against closed forms and end-to-end on
an accelerating synthetic trajectory (the gates_oscillating_motion
analogue)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu import imu as imu_mod
from loam_tpu.io import synth

CFG = dataclasses.replace(LoamConfig(), ring_width=1024, odom_y_scale=1.0)


def _stream(t, rpy, acc, mask):
    return imu_mod.ImuStream(
        t=jnp.asarray(t), rpy=jnp.asarray(rpy),
        acc=jnp.asarray(acc), mask=jnp.asarray(mask),
    )


def test_integrate_constant_acceleration():
    """Identity orientation + constant body acc -> v = a t, x = a t^2 / 2."""
    n, cap = 40, 64
    dt = 0.005
    t = np.zeros(cap, np.float32)
    t[:n] = np.arange(n) * dt
    mask = np.zeros(cap, bool)
    mask[:n] = True
    acc = np.zeros((cap, 3), np.float32)
    acc[:n] = [0.0, 0.0, 2.0]
    integ = imu_mod.integrate(
        _stream(t, np.zeros((cap, 3), np.float32), acc, mask), CFG
    )
    tt = t[n - 1]
    np.testing.assert_allclose(
        np.asarray(integ.velo)[n - 1], [0, 0, 2.0 * tt], atol=1e-4
    )
    # first-order integration accumulates a dt/2 bias per step; exact form
    np.testing.assert_allclose(
        np.asarray(integ.shift)[n - 1, 2], 0.5 * 2.0 * tt * tt,
        atol=2.0 * tt * dt,
    )


def test_integrate_freezes_across_gaps():
    """dt >= scanPeriod intervals contribute nothing
    (src/scanRegistration.cpp:199 guard)."""
    cap = 8
    t = np.array([0.0, 0.01, 0.5, 0.51, 0, 0, 0, 0], np.float32)
    mask = np.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    acc = np.zeros((cap, 3), np.float32)
    acc[:4] = [0.0, 0.0, 1.0]
    integ = imu_mod.integrate(
        _stream(t, np.zeros((cap, 3), np.float32), acc, mask), CFG
    )
    v = np.asarray(integ.velo)[:, 2]
    assert v[2] == v[1], "gap interval must not integrate"
    assert v[3] > v[2]


def test_sweep_state_constant_velocity_cancels():
    """Constant-velocity motion has zero nonlinear drift: shiftFromStart
    and veloFromStart vanish (ShiftToStartIMU subtracts the linear
    prediction, src/scanRegistration.cpp:110-112)."""
    pose_fn = lambda t: np.array([0, 0, 0, 0.3 * t, 0, 1.2 * t])
    t, rpy, acc, mask = synth.simulate_imu_window(pose_fn, t0=1.0)
    stream = _stream(t, rpy, acc, mask)
    integ = imu_mod.integrate(stream, CFG)
    rel = jnp.linspace(0.0, 1.0, 64)
    sw = imu_mod.sweep_state(
        stream, integ, jnp.float32(1.0), rel, jnp.ones(64, bool), CFG
    )
    np.testing.assert_allclose(
        np.asarray(sw.shift_from_start), 0.0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sw.velo_from_start_last), 0.0, atol=1e-3
    )


def test_sweep_state_nonlinear_drift_matches_closed_form():
    """Accelerating motion: drift(t) = x(t) - x(t0) - v(t0)(t - t0),
    independent of the unknown velocity at integration start."""
    pose_fn = synth.accel_trajectory(speed_amp=2.0, period=0.7)
    t0 = 0.9
    t, rpy, acc, mask = synth.simulate_imu_window(pose_fn, t0=t0)
    stream = _stream(t, rpy, acc, mask)
    integ = imu_mod.integrate(stream, CFG)
    rel = jnp.linspace(0.0, 1.0, 32)
    sw = imu_mod.sweep_state(
        stream, integ, jnp.float32(t0), rel, jnp.ones(32, bool), CFG
    )
    h = 1e-3
    x = lambda tt: pose_fn(tt)[3:6]
    v0 = (x(t0 + h) - x(t0 - h)) / (2 * h)
    for i in (10, 20, 31):
        tt = t0 + float(rel[i]) * CFG.scan_period
        expect = x(tt) - x(t0) - v0 * (tt - t0)
        np.testing.assert_allclose(
            np.asarray(sw.shift_from_start)[i], expect, atol=2e-3
        )


def test_deskew_pure_rotation_exact():
    """Pure-rotation sweep: deskewed point must equal R_start^T @ p_world
    (TransformToStartIMU with zero shift, src/scanRegistration.cpp:146-171)."""
    pose_fn = lambda t: np.array([0, 0.8 * np.sin(2 * np.pi * t), 0, 0, 0, 0])
    t0 = 0.25
    t, rpy, acc, mask = synth.simulate_imu_window(pose_fn, t0=t0)
    stream = _stream(t, rpy, acc, mask)
    integ = imu_mod.integrate(stream, CFG)
    rng = np.random.default_rng(0)
    rel = jnp.asarray(np.sort(rng.uniform(0, 1, 16)).astype(np.float32))
    sw = imu_mod.sweep_state(
        stream, integ, jnp.float32(t0), rel, jnp.ones(16, bool), CFG
    )
    pts_body = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    out = np.asarray(imu_mod.deskew_points(pts_body, sw))
    from loam_tpu.utils import rotations

    for i in (0, 5, 15):
        ryaw = 0.8 * np.sin(2 * np.pi * (t0 + float(rel[i]) * CFG.scan_period))
        yaw0 = 0.8 * np.sin(2 * np.pi * t0)
        R_cur = np.asarray(rotations.r_yxz(jnp.asarray([0.0, ryaw, 0.0])))
        R_start = np.asarray(rotations.r_yxz(jnp.asarray([0.0, yaw0, 0.0])))
        expect = R_start.T @ R_cur @ np.asarray(pts_body[i])
        np.testing.assert_allclose(out[i], expect, atol=2e-3)


def test_pipeline_imu_aiding_on_accelerating_motion():
    """Full pipeline on an accelerating trajectory (peak ~8 m/s^2, the
    realistic end of the gates_oscillating_motion regime): IMU deskew +
    priors must improve over the unaided run.

    Note: beyond this envelope (~2.5 g oscillation) the damped-GN odometry
    undershoots each sweep's linear motion and the IMU velocity prior
    amplifies the oscillation — the same mechanism behind the reference's
    documented divergence on gates_oscillating_motion (README.md:37-38)."""
    from loam_tpu import pipeline, metrics

    cfg = dataclasses.replace(
        CFG,
        odom_weight_start_iter=0,
        corner_table_size=1 << 14,
        surf_table_size=1 << 15,
        search_buckets=1 << 12,
        max_corner_from_map=8192,
        max_surf_from_map=16384,
    )
    F = 10
    world = synth.make_world(seed=3)
    pose_fn = synth.accel_trajectory(speed_amp=1.2, period=0.9)
    raws, msks, streams, tscans, gt = [], [], [], [], []
    for k in range(F):
        t0 = k * cfg.scan_period
        xyz, m = synth.simulate_sweep_traj(
            world, pose_fn, t0, n_azimuth=900, seed=3 + k
        )
        t, rpy, acc, mask = synth.simulate_imu_window(pose_fn, t0=t0)
        raws.append(xyz)
        msks.append(m)
        streams.append((t, rpy, acc, mask))
        tscans.append(t0)
        gt.append(pose_fn(t0 + cfg.scan_period)[3:6])
    raw = jnp.asarray(np.stack(raws))
    msk = jnp.asarray(np.stack(msks))
    imu_streams = imu_mod.ImuStream(
        t=jnp.asarray(np.stack([s[0] for s in streams])),
        rpy=jnp.asarray(np.stack([s[1] for s in streams])),
        acc=jnp.asarray(np.stack([s[2] for s in streams])),
        mask=jnp.asarray(np.stack([s[3] for s in streams])),
    )
    gt = np.stack(gt)

    outs_imu = pipeline.replay_sweeps(
        raw, msk, cfg, imu_streams, jnp.asarray(tscans, jnp.float32)
    )
    outs_raw = pipeline.replay_sweeps(raw, msk, cfg)
    ate_imu = metrics.ate_rmse(
        np.asarray(outs_imu.pose_integrated)[:, 3:6], gt
    )
    ate_raw = metrics.ate_rmse(
        np.asarray(outs_raw.pose_integrated)[:, 3:6], gt
    )
    assert np.isfinite(ate_imu)
    assert ate_imu < 0.05, (ate_imu, ate_raw)
    assert ate_imu < ate_raw, (ate_imu, ate_raw)
