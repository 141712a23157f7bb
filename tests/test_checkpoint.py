"""Checkpoint/resume: state round-trips bit-exactly and a resumed replay
matches an uninterrupted one (capability absent from the reference, whose
map/pose state dies with the process — SURVEY.md §5)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu import checkpoint, frontend, pipeline
from loam_tpu.ops.features import extract_features

CFG = dataclasses.replace(
    LoamConfig(),
    ring_width=512,
    odom_y_scale=1.0,
    max_less_flat=2048,
    less_flat_ring_cap=128,
    corner_table_size=1 << 13,
    surf_table_size=1 << 14,
    search_buckets=1 << 11,
    max_corner_stack=1024,
    max_surf_stack=2048,
    odom_max_iters=8,
    map_max_iters=4,
)


def _feats(frames):
    world = synth.make_world(seed=2)
    poses = synth.straight_trajectory(frames, speed=1.0)
    poses = np.vstack([poses[:1], poses])[: frames + 1]
    fs = []
    for k in range(frames):
        xyz, m = synth.simulate_sweep(
            world, poses[k], poses[k + 1], n_azimuth=450, seed=2 + k
        )
        n = CFG.max_points
        sweep = frontend.ingest_sweep(
            jnp.asarray(xyz[:n]), jnp.asarray(m[:n]), CFG
        )
        fs.append(extract_features(sweep, CFG))
    return jax.tree_util.tree_map(lambda *x: jnp.stack(x), *fs)


def test_state_roundtrip_and_resume(tmp_path):
    feats = _feats(6)

    def step(state, f):
        return pipeline.pipeline_step(state, f, None, CFG)

    step = jax.jit(step)

    # uninterrupted run
    s = pipeline.PipelineState.create(CFG)
    poses_ref = []
    for k in range(6):
        s, out = step(s, jax.tree_util.tree_map(lambda x: x[k], feats))
        poses_ref.append(np.asarray(out.pose_integrated))

    # run 3 frames, checkpoint, restore into fresh state, run the rest
    ck = checkpoint.CheckpointManager(str(tmp_path / "ck"))
    s2 = pipeline.PipelineState.create(CFG)
    for k in range(3):
        s2, _ = step(s2, jax.tree_util.tree_map(lambda x: x[k], feats))
    ck.save(3, s2, metadata={"next_frame": 3}, wait=True)

    fresh = pipeline.PipelineState.create(CFG)
    s3, meta = ck.restore(None, fresh)
    assert meta["next_frame"] == 3
    # bit-exact state restore
    for a, b in zip(
        jax.tree_util.tree_leaves(s2), jax.tree_util.tree_leaves(s3)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for k in range(3, 6):
        s3, out = step(s3, jax.tree_util.tree_map(lambda x: x[k], feats))
        np.testing.assert_allclose(
            np.asarray(out.pose_integrated), poses_ref[k], atol=1e-6
        )
    ck.close()


def test_checkpointed_replay_resumes(tmp_path):
    feats = _feats(5)

    def step(state, f):
        return pipeline.pipeline_step(state, f, None, CFG)

    step = jax.jit(step)
    ck = checkpoint.CheckpointManager(str(tmp_path / "ck2"))

    s0 = pipeline.PipelineState.create(CFG)
    _, outs_full = checkpoint.checkpointed_replay(
        step, s0, feats, ck, every=2
    )
    assert len(outs_full) == 5

    # second call resumes from the last checkpoint (frame 4)
    s1 = pipeline.PipelineState.create(CFG)
    _, outs_resumed = checkpoint.checkpointed_replay(
        step, s1, feats, ck, every=2
    )
    assert len(outs_resumed) == 1  # only frame 4 re-run
    np.testing.assert_allclose(
        np.asarray(outs_resumed[0].pose_integrated),
        np.asarray(outs_full[4].pose_integrated),
        atol=1e-6,
    )
    ck.close()
