"""Online (streaming) IMU path: the engine's imuHandler-equivalent
subscription (VERDICT r1 #7).

The hector variant is IMU-centric (launch/hector_loam_velodyne.launch) and
the reference consumes IMU in BOTH scanRegistration (deskew + velocity
prior) and laserMapping (roll/pitch blend); the streaming engine must do
the same online.  Driven on the accelerating synthetic trajectory where
IMU aiding is load-bearing.
"""

import dataclasses

import numpy as np
import pytest
import jax

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu import metrics
from loam_tpu.runtime.streaming import StreamingEngine

CFG = dataclasses.replace(
    LoamConfig(),
    ring_width=1024,
    odom_weight_start_iter=0,
    corner_table_size=1 << 14,
    surf_table_size=1 << 15,
    search_buckets=1 << 12,
    max_corner_from_map=8192,
    max_surf_from_map=16384,
)

G = 9.81


def _to_sensor_frame(rpy_internal, acc_internal):
    """Invert the imuHandler conversion (src/scanRegistration.cpp:640-647):
    internal (pitch, yaw, roll) + gravity-free internal acceleration ->
    quaternion RPY + raw velodyne-frame linear acceleration."""
    pitch, yaw, roll = rpy_internal
    ax, ay, az = acc_internal
    sr, cr = np.sin(roll), np.cos(roll)
    sp, cp = np.sin(pitch), np.cos(pitch)
    acc_velo = np.array([
        az - sp * G,            # a.x
        ax + sr * cp * G,       # a.y
        ay + cr * cp * G,       # a.z
    ])
    return np.array([roll, pitch, yaw]), acc_velo


def _global_imu(pose_fn, t_end, rate=200.0):
    ts = np.arange(-0.05, t_end + 0.05, 1.0 / rate)
    h = 1e-3
    out = []
    for t in ts:
        p = pose_fn(t)
        a_w = (pose_fn(t + h)[3:6] - 2 * p[3:6] + pose_fn(t - h)[3:6]) / h**2
        from loam_tpu.utils import rotations
        import jax.numpy as jnp

        R = np.asarray(rotations.r_yxz(jnp.asarray(p[:3], jnp.float32)))
        acc_int = R.T @ a_w
        rpy, acc_velo = _to_sensor_frame(p[:3], acc_int)
        out.append((t, rpy, acc_velo))
    return out


@pytest.mark.slow
def test_streaming_engine_with_imu_on_accelerating_motion():
    F = 8
    world = synth.make_world(seed=3)
    pose_fn = synth.accel_trajectory(speed_amp=1.2, period=0.9)
    sweeps = []
    gt = []
    for k in range(F):
        t0 = k * CFG.scan_period
        xyz, m = synth.simulate_sweep_traj(
            world, pose_fn, t0, n_azimuth=600, seed=3 + k
        )
        n = CFG.max_points
        sweeps.append((xyz[:n], m[:n], t0))
        gt.append(pose_fn(t0 + CFG.scan_period)[3:6])
    gt = np.stack(gt)
    imu_samples = _global_imu(pose_fn, F * CFG.scan_period)

    def run(with_imu: bool):
        eng = StreamingEngine(CFG)
        eng.start()
        cursor = 0
        for xyz, m, t0 in sweeps:
            if with_imu:
                horizon = t0 + CFG.scan_period + 0.05
                while cursor < len(imu_samples) and \
                        imu_samples[cursor][0] <= horizon:
                    t, rpy, acc = imu_samples[cursor]
                    eng.push_imu(t, rpy, acc)
                    cursor += 1
            eng.push_sweep(xyz, m, t0)
            assert eng.drain(timeout_s=600)
        traj = eng.trajectory()
        eng.stop()
        return traj

    traj_imu = run(True)
    assert traj_imu.shape[0] == F
    assert np.isfinite(traj_imu).all()
    ate_imu = metrics.ate_rmse(traj_imu[:, 3:6], gt)
    # IMU-aided online tracking holds the accelerating trajectory
    assert ate_imu < 0.06, ate_imu

    traj_raw = run(False)
    ate_raw = metrics.ate_rmse(traj_raw[:, 3:6], gt)
    assert ate_imu < ate_raw + 1e-6, (ate_imu, ate_raw)
