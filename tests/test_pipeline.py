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


def test_static_cadence_matches_dynamic():
    """pipeline_step(do_mapping=<static>) driven by pipeline.mapping_frame
    must reproduce the runtime-cond path bit-for-bit (the batched-replay
    fast path relies on this equivalence)."""
    import jax
    from loam_tpu import frontend
    from loam_tpu.ops.features import extract_features

    raw, mask, _ = _make_sequence(seed=2, speed=0.8, yaw_rate=0.05)
    F = 8
    feats = jax.vmap(
        lambda x, m: extract_features(frontend.ingest_sweep(x, m, CFG), CFG)
    )(jnp.asarray(raw[:F]), jnp.asarray(mask[:F]))

    dyn = jax.jit(lambda s, f: pipeline.pipeline_step(s, f, None, CFG))
    st_map = jax.jit(
        lambda s, f: pipeline.pipeline_step(s, f, None, CFG, do_mapping=True)
    )
    st_nomap = jax.jit(
        lambda s, f: pipeline.pipeline_step(s, f, None, CFG, do_mapping=False)
    )

    s_dyn = pipeline.PipelineState.create(CFG)
    s_st = pipeline.PipelineState.create(CFG)
    for k in range(F):
        f = jax.tree_util.tree_map(lambda x: x[k], feats)
        s_dyn, o_dyn = dyn(s_dyn, f)
        step = st_map if pipeline.mapping_frame(k, CFG) else st_nomap
        s_st, o_st = step(s_st, f)
        assert bool(o_dyn.mapped) == pipeline.mapping_frame(k, CFG), k
        np.testing.assert_array_equal(
            np.asarray(o_dyn.pose_integrated), np.asarray(o_st.pose_integrated)
        )
    np.testing.assert_array_equal(
        np.asarray(s_dyn.map.transform_aft), np.asarray(s_st.map.transform_aft)
    )
