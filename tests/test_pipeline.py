"""Full pipeline (frontend -> odometry -> mapping -> integration) on a
synthetic trajectory: mapping must pull the odometry's ~2 cm/frame drift
back to centimeter-level ATE."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu import pipeline, metrics

CFG = dataclasses.replace(
    LoamConfig(),
    ring_width=1024,
    odom_y_scale=1.0,   # synthetic data has no VLP-16 systematic bias
    # synthetic long-range sampling is far sparser than real lidar returns;
    # robust-weight from iteration 0 (the reference waits 5 unweighted
    # iterations, src/laserOdometry.cpp:570) keeps bogus far tripods out
    odom_weight_start_iter=0,
    corner_table_size=1 << 14,
    surf_table_size=1 << 15,
    search_buckets=1 << 12,
    max_corner_from_map=8192,
    max_surf_from_map=16384,
)

N_FRAMES = 16


def _make_sequence(seed=0, speed=1.0, yaw_rate=0.0):
    world = synth.make_world(seed=seed)
    poses = synth.straight_trajectory(N_FRAMES, speed=speed, yaw_rate=yaw_rate)
    # static first sweep anchors the world frame at GT pose 0; keep the
    # remaining sweep-boundary spacing unchanged (no double-speed sweep)
    poses = np.vstack([poses[:1], poses])[: N_FRAMES + 1]
    xs, ms = [], []
    for k in range(N_FRAMES):
        xyz, m = synth.simulate_sweep(
            world, poses[k], poses[k + 1], n_azimuth=900, seed=seed + k
        )
        xs.append(xyz)
        ms.append(m)
    return np.stack(xs), np.stack(ms), poses


def test_full_pipeline_ate():
    raw, mask, gt = _make_sequence(seed=1, speed=1.0)
    outs = pipeline.replay_sweeps(jnp.asarray(raw), jnp.asarray(mask), CFG)
    est = np.asarray(outs.pose_integrated)
    gt_pos = gt[1 : N_FRAMES + 1, 3:6]  # pose at each sweep end
    est_pos = est[:, 3:6]
    ate_map = metrics.ate_rmse(est_pos, gt_pos)
    ate_odom = metrics.ate_rmse(np.asarray(outs.pose_odom)[:, 3:6], gt_pos)
    # mapping must beat the raw odometry and reach cm level
    assert ate_map < 0.05, (ate_map, ate_odom, est_pos[-4:], gt_pos[-4:])
    assert ate_map <= ate_odom + 1e-6, (ate_map, ate_odom)


def test_full_pipeline_turning():
    raw, mask, gt = _make_sequence(seed=5, speed=0.8, yaw_rate=0.1)
    outs = pipeline.replay_sweeps(jnp.asarray(raw), jnp.asarray(mask), CFG)
    est_pos = np.asarray(outs.pose_integrated)[:, 3:6]
    gt_pos = gt[1 : N_FRAMES + 1, 3:6]
    ate = metrics.ate_rmse(est_pos, gt_pos)
    assert ate < 0.06, ate
