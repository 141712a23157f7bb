"""C17 completion: the registered full-res cloud and the cadenced
surround cloud (src/laserMapping.cpp:1038-1069)."""

import dataclasses
import glob
import os

import numpy as np
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu import pipeline
from loam_tpu.utils import rotations

CFG = dataclasses.replace(
    LoamConfig(),
    ring_width=1024,
    corner_table_size=1 << 14,
    surf_table_size=1 << 15,
    search_buckets=1 << 12,
    emit_registered=True,
)


def _sequence(F=8, seed=3):
    world = synth.make_world(seed=seed)
    poses = synth.straight_trajectory(F, speed=0.8, yaw_rate=0.1)
    poses = np.vstack([poses[:1], poses])[: F + 1]
    sweeps = [
        synth.simulate_sweep(
            world, poses[k], poses[k + 1], n_azimuth=600, seed=seed + k
        )
        for k in range(F)
    ]
    return np.stack([s[0] for s in sweeps]), np.stack([s[1] for s in sweeps])


def test_registered_cloud_every_mapping_frame():
    raw, msk = _sequence()
    outs = pipeline.replay_sweeps(jnp.asarray(raw), jnp.asarray(msk), CFG)
    mapped = np.asarray(outs.mapped)
    reg = outs.registered
    counts = np.asarray(reg.mask.sum(axis=1))
    # published exactly on mapping frames (src/laserMapping.cpp:1060-1069)
    assert np.array_equal(counts > 0, mapped)
    # on a mapped frame, the registered cloud is the full sweep projected
    # by the refined pose: every registered point must equal
    # apply_pose(pose_aft, p_body) for some valid full-cloud point
    k = int(np.nonzero(mapped)[0][-1])
    pose = np.asarray(outs.pose_aft)[k]
    reg_xyz = np.asarray(reg.xyz[k])[np.asarray(reg.mask[k])]
    # reconstruct body-frame cloud: inverse-project and check ranges sane
    body = np.asarray(
        rotations.apply_pose_inverse(jnp.asarray(pose), jnp.asarray(reg_xyz))
    )
    r = np.linalg.norm(body, axis=1)
    assert r.min() > 0.2 and r.max() < 90.0
    # the registered cloud moves with the trajectory: its centroid must
    # track the pose translation, not stay at the origin
    assert abs(np.mean(reg_xyz[:, 2]) - pose[5]) < 15.0


def test_cli_stream_clouds_cadence(tmp_path):
    from loam_tpu import cli

    out = tmp_path / "out"
    rc = cli.main([
        "--synthetic", "20", "--out-dir", str(out), "--stream-clouds",
        "--ring-width", "1024",
    ])
    assert rc == 0
    regs = sorted(glob.glob(os.path.join(str(out), "clouds",
                                         "registered_*.ply")))
    surs = sorted(glob.glob(os.path.join(str(out), "clouds",
                                         "surround_*.ply")))
    # 20 sweeps -> mapping on frames 1,3,...,19 = 10 registered clouds;
    # surround every map_frame_num-th mapping frame = every 10 sweeps
    assert len(regs) == 10, regs
    assert len(surs) == 2, surs
    # cadence: registered frames are the odd sweep indices
    ks = [int(os.path.basename(p).split("_")[1].split(".")[0]) for p in regs]
    assert ks == list(range(1, 20, 2))
    for p in regs[:2] + surs:
        assert os.path.getsize(p) > 200
