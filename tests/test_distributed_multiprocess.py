"""REAL multi-process DCN execution of the distributed replay layer
(closes the one 'partial' of VERDICT r4's §2 inventory: every code path
of parallel/distributed.py existed and was tested single-process, but
no multi-process execution had ever run).

Two OS processes x 4 virtual CPU devices each join a jax.distributed
cluster over a loopback coordinator — the same wire machinery
(coordination service, cross-process array assembly via
make_array_from_process_local_data, SPMD launch over the global 8-device
mesh, cross-process allgather of results) that a 2-host TPU deployment
uses, with DCN played by loopback.  Each process loads only ITS shard;
the gathered global trajectory must be identical on both processes AND
match the single-process unsharded replay bit-for-bit-ish.
"""

import dataclasses
import os
import socket
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

B_LOCAL = 4   # scenarios per process (one per local device; dp=8 global)
FRAMES = 2
NPROC = 2


def make_cfg():
    from loam_tpu.config import LoamConfig

    return dataclasses.replace(
        LoamConfig(),
        ring_width=512,
        odom_y_scale=1.0,
        max_less_flat=2048,
        less_flat_ring_cap=128,
        corner_table_size=1 << 13,
        surf_table_size=1 << 14,
        search_buckets=1 << 11,
        max_corner_from_map=2048,
        max_surf_from_map=4096,
        max_corner_stack=1024,
        max_surf_stack=2048,
        odom_max_iters=8,
        map_max_iters=4,
    )


def make_local_scenarios(pid: int):
    """Deterministic per-process scenario shard (seeded by global
    scenario index, so the parent can rebuild the global batch)."""
    from loam_tpu.io import synth

    cfg = make_cfg()
    raws, msks = [], []
    for b in range(B_LOCAL):
        g = pid * B_LOCAL + b
        world = synth.make_world(seed=40 + g)
        poses = synth.straight_trajectory(FRAMES, speed=0.8 + 0.1 * g)
        poses = np.vstack([poses[:1], poses])[: FRAMES + 1]
        xs, ms = [], []
        for k in range(FRAMES):
            xyz, m = synth.simulate_sweep(
                world, poses[k], poses[k + 1], n_azimuth=450,
                seed=g * 31 + k,
            )
            n = cfg.max_points
            xs.append(xyz[:n])
            ms.append(m[:n])
        raws.append(np.stack(xs))
        msks.append(np.stack(ms))
    return np.stack(raws), np.stack(msks)


def test_two_process_dcn_replay(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "dcn_worker.py")
    env = dict(os.environ)
    # a clean CPU-only interpreter: without this the axon sitecustomize
    # registers the TPU plugin at startup, initializing the XLA backend
    # before jax.distributed.initialize can run
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo
    outs = [str(tmp_path / f"w{p}.npz") for p in range(NPROC)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(NPROC), str(p), outs[p]],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in range(NPROC)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    w = [np.load(o) for o in outs]
    # the cluster really had 2 processes / 8 global devices
    for z in w:
        assert int(z["process_count"]) == NPROC
        assert int(z["device_count"]) == 8
        assert int(z["frames_total"]) == NPROC * B_LOCAL * FRAMES
    # both processes gathered the IDENTICAL global trajectory and agreed
    # on the reduced rate (the cross-DCN allgather/allreduce contract)
    np.testing.assert_array_equal(w[0]["poses"], w[1]["poses"])
    assert w[0]["rate"] == w[1]["rate"] and w[0]["rate"] > 0

    # and the distributed result matches the single-process unsharded
    # replay of the same global batch
    import jax
    from loam_tpu import pipeline

    cfg = make_cfg()
    shards = [make_local_scenarios(p) for p in range(NPROC)]
    raw = np.concatenate([s[0] for s in shards])
    msk = np.concatenate([s[1] for s in shards])
    ref = jax.vmap(lambda x, m: pipeline.replay_sweeps(x, m, cfg))(
        jnp.asarray(raw), jnp.asarray(msk)
    )
    np.testing.assert_allclose(
        w[0]["poses"], np.asarray(ref.pose_integrated), atol=5e-4
    )
    assert np.isfinite(w[0]["poses"]).all()
