"""DP/TP sharded replay on the virtual 8-device CPU mesh: sharded results
must match the unsharded single-device path bit-for-bit-ish."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """executable.serialize() on this module's big tp-sharded /
    vmapped-replay executables segfaults this container's jaxlib when
    the full suite runs (reproducible at the same
    put_executable_and_time frame; standalone runs are fine).  The
    persistent-cache write is pure optimization — disable it for this
    module.  NOTE: jax caches the cache object in a module global, so
    changing the config dir alone is not enough; reset_cache() forces
    re-initialization against the new (None) dir."""
    from jax._src import compilation_cache as cc

    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    cc.reset_cache()
    yield
    jax.config.update("jax_compilation_cache_dir", old)
    cc.reset_cache()

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu import pipeline
from loam_tpu.parallel import replay as preplay

CFG = dataclasses.replace(
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


def _scenarios(batch, frames):
    raws, msks = [], []
    for b in range(batch):
        world = synth.make_world(seed=10 + b)
        poses = synth.straight_trajectory(frames, speed=0.8 + 0.1 * b)
        poses = np.vstack([poses[:1], poses])[: frames + 1]
        xs, ms = [], []
        for k in range(frames):
            xyz, m = synth.simulate_sweep(
                world, poses[k], poses[k + 1], n_azimuth=450, seed=b * 31 + k
            )
            n = CFG.max_points
            xyz, m = xyz[:n], m[:n]
            xs.append(xyz)
            ms.append(m)
        raws.append(np.stack(xs))
        msks.append(np.stack(ms))
    return jnp.asarray(np.stack(raws)), jnp.asarray(np.stack(msks))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_replay_matches_unsharded():
    mesh = preplay.make_mesh(8, tp=2)
    raw, msk = _scenarios(batch=4, frames=3)

    sharded = preplay.make_sharded_replay(mesh, CFG)
    outs_sh = sharded(raw, msk)

    outs_ref = jax.vmap(lambda x, m: pipeline.replay_sweeps(x, m, CFG))(
        raw, msk
    )
    np.testing.assert_allclose(
        np.asarray(outs_sh.pose_integrated),
        np.asarray(outs_ref.pose_integrated),
        atol=5e-4,
    )
    assert np.isfinite(np.asarray(outs_sh.pose_integrated)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_runs_dp_only():
    mesh = preplay.make_mesh(8, tp=1)
    raw, msk = _scenarios(batch=8, frames=1)
    feats = preplay.batched_frontend(raw, msk, CFG)
    f0 = jax.tree_util.tree_map(lambda x: x[:, 0], feats)
    state = preplay.batched_initial_state(8, CFG)
    step = preplay.make_sharded_step(mesh, CFG)
    new_state, out = step(state, f0)
    assert np.isfinite(np.asarray(out.pose_integrated)).all()
