"""End-to-end golden parity of the IMU-AIDED pipeline (VERDICT r3 #3).

The reference composes IMU aiding through all four nodes: per-point
deskew (/root/reference/src/scanRegistration.cpp:286-347), odometry
velocity prior + TransformToEnd IMU tail + PluginIMURotation
(laserOdometry.cpp:461-463,126-194,848-856), and the mapping roll/pitch
blend (laserMapping.cpp:199-232).  Its README names
gates_oscillating_motion as the aggressive-motion validation case
(README.md:25,37-38); with no bags in this container the oscillating
synthetic trajectory is the stand-in.  This gate replays the same raw
sweeps + IMU sample stream through the NumPy oracle
(tests/golden/pipeline.run_pipeline_imu) and the composed TPU pipeline
and bounds the trajectory divergence — so ANY drift in the IMU plumbing
fails loudly.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu import imu as imu_mod
from loam_tpu import metrics, pipeline

from golden.pipeline import run_pipeline_imu

F = 40
N_AZIMUTH = 600
RATE = 200.0
T0 = 0.06          # first sweep stamp (IMU stream starts at t=0)
LEAD = 0.05        # window lead before the sweep
HORIZON = 0.13     # samples available when the sweep callback fires
CAP = 64

CFG = dataclasses.replace(
    LoamConfig(),
    ring_width=1024,
    corner_table_size=1 << 15,
    surf_table_size=1 << 17,
    map_exact_knn=False,
)


def _make_imu_sequence(seed: int = 11):
    """Raw sweeps along the oscillating trajectory + the exact IMU
    sample stream a perfect (noise-free) IMU would emit for it."""
    world = synth.make_world(seed=seed)
    pose_fn = synth.oscillating_trajectory()
    t_scans = T0 + 0.1 * np.arange(F)

    raws, msks = [], []
    for k in range(F):
        xyz, m = synth.simulate_sweep_traj(
            world, pose_fn, t0=float(t_scans[k]), n_azimuth=N_AZIMUTH,
            seed=seed + k,
        )
        raws.append(xyz)
        msks.append(m)
    raw = np.stack(raws)
    msk = np.stack(msks)

    # global IMU stream: orientation straight from the trajectory,
    # body-frame coordinate acceleration from central differences — the
    # post-gravity-removal quantities of scanRegistration.cpp:643-647
    imu_t = np.arange(0.0, float(t_scans[-1]) + 0.25, 1.0 / RATE)
    h = 1e-3
    rpy = np.zeros((imu_t.shape[0], 3))
    acc = np.zeros((imu_t.shape[0], 3))
    for i, t in enumerate(imu_t):
        p = pose_fn(t)
        rpy[i] = p[:3]  # (pitch, yaw, roll) == (rx, ry, rz)
        a_w = (pose_fn(t + h)[3:6] - 2 * p[3:6] + pose_fn(t - h)[3:6]) / h**2
        R, _ = synth._pose_matrix(p)
        acc[i] = R.T @ a_w
    return raw, msk, imu_t, rpy.astype(np.float32), \
        acc.astype(np.float32), t_scans, pose_fn


def _frame_windows(imu_t, rpy, acc, t_scans):
    """Per-frame ImuStream windows over the SAME global samples the
    oracle is fed (arrival cut at t_scan + HORIZON)."""
    ts, rs, as_, ms = [], [], [], []
    for t0 in t_scans:
        sel = np.nonzero((imu_t >= t0 - LEAD) & (imu_t <= t0 + HORIZON))[0]
        n = sel.shape[0]
        assert 0 < n <= CAP
        t_w = np.zeros(CAP, np.float32)
        r_w = np.zeros((CAP, 3), np.float32)
        a_w = np.zeros((CAP, 3), np.float32)
        m_w = np.zeros(CAP, bool)
        t_w[:n] = imu_t[sel]
        r_w[:n] = rpy[sel]
        a_w[:n] = acc[sel]
        m_w[:n] = True
        ts.append(t_w)
        rs.append(r_w)
        as_.append(a_w)
        ms.append(m_w)
    return imu_mod.ImuStream(
        t=jnp.asarray(np.stack(ts)),
        rpy=jnp.asarray(np.stack(rs)),
        acc=jnp.asarray(np.stack(as_)),
        mask=jnp.asarray(np.stack(ms)),
    )


@pytest.fixture(scope="module")
def imu_runs():
    raw, msk, imu_t, rpy, acc, t_scans, pose_fn = _make_imu_sequence()
    oracle = run_pipeline_imu(raw, msk, imu_t, rpy, acc, t_scans,
                              feed_horizon=HORIZON)
    streams = _frame_windows(imu_t, rpy, acc, t_scans)
    outs = pipeline.replay_sweeps(
        jnp.asarray(raw), jnp.asarray(msk), CFG,
        imu_streams=streams, t_scans=jnp.asarray(t_scans, jnp.float32),
    )
    return oracle, outs, pose_fn, t_scans


def test_imu_odometry_parity(imu_runs):
    """IMU-aided scan-to-scan odometry pins to the reference
    transcription (deskew + velocity prior + PluginIMURotation all
    live)."""
    oracle, outs, _, _ = imu_runs
    est = np.asarray(outs.pose_odom)[:, 3:6]
    ref = oracle["odom"][:, 3:6]
    ate = metrics.ate_rmse(est, ref)
    assert ate < 0.02, f"IMU odometry ATE vs oracle {100 * ate:.2f} cm"


def test_imu_integrated_parity_north_star(imu_runs):
    """The composed IMU-aided pipeline holds the BASELINE.md 5 cm gate
    against the oracle on the oscillating-motion sequence."""
    oracle, outs, _, _ = imu_runs
    est = np.asarray(outs.pose_integrated)[:, 3:6]
    ref = oracle["integrated"][:, 3:6]
    ate = metrics.ate_rmse(est, ref)
    per_frame = np.linalg.norm(est - ref, axis=1)
    assert ate < 0.05, (
        f"IMU integrated ATE vs oracle {100 * ate:.2f} cm; "
        f"worst frame {100 * per_frame.max():.2f} cm"
    )


def test_imu_attitude_parity(imu_runs):
    """Pitch/roll (where PluginIMURotation and the mapping blend act)
    stay within 0.3 deg of the oracle."""
    oracle, outs, _, _ = imu_runs
    est = np.asarray(outs.pose_integrated)[:, [0, 2]]
    ref = oracle["integrated"][:, [0, 2]]
    err = np.abs(est - ref).max()
    assert err < np.radians(0.3), (
        f"max pitch/roll divergence {np.degrees(err):.3f} deg"
    )


def test_imu_aiding_is_load_bearing(imu_runs):
    """Sanity: on this aggressive-motion sequence the IMU-aided estimate
    tracks ground truth, and the aiding path visibly changes the result
    (guards against the IMU plumbing silently becoming a no-op)."""
    oracle, outs, pose_fn, t_scans = imu_runs
    est = np.asarray(outs.pose_integrated)[:, 3:6]
    gt = np.stack([pose_fn(t + 0.1)[3:6] for t in t_scans])
    ate_gt = metrics.ate_rmse(est, gt)
    assert ate_gt < 0.30, f"IMU-aided ATE vs ground truth {ate_gt:.3f} m"

    raw, msk = None, None  # the no-IMU rerun reuses the fixture inputs
    raw_np, msk_np, *_ = _make_imu_sequence()
    outs_noimu = pipeline.replay_sweeps(
        jnp.asarray(raw_np), jnp.asarray(msk_np), CFG
    )
    est_no = np.asarray(outs_noimu.pose_integrated)[:, 3:6]
    diff = np.linalg.norm(est - est_no, axis=1).max()
    assert diff > 1e-3, "IMU aiding changed nothing — plumbing dead?"
