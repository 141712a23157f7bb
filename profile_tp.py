"""TP (Jacobian-row sharding) vs pure-DP cost on the virtual 8-device
CPU mesh (VERDICT r4 #9).

Runs the same 8-scenario batched pipeline step as (dp=8, tp=1) and
(dp=4, tp=2), asserts the poses agree, and reports wall-clock per step.
CAVEAT: 8 XLA host devices share this container's 2 physical cores, so
the times measure host contention + collective/program structure, not
ICI; the structural takeaway (how many collectives TP inserts and where)
is what transfers to real hardware.  See PARITY.md "TP status".

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python profile_tp.py
"""

import dataclasses
import json
import os
import time

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
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
                world, poses[k], poses[k + 1], n_azimuth=450,
                seed=b * 31 + k,
            )
            n = CFG.max_points
            xs.append(xyz[:n])
            ms.append(m[:n])
        raws.append(np.stack(xs))
        msks.append(np.stack(ms))
    return jnp.asarray(np.stack(raws)), jnp.asarray(np.stack(msks))


def _collective_count(compiled):
    txt = compiled.as_text()
    return sum(txt.count(op) for op in
               ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute"))


def main():
    raw, msk = _scenarios(batch=8, frames=1)
    feats = preplay.batched_frontend(raw, msk, CFG)
    f0 = jax.tree_util.tree_map(lambda x: x[:, 0], feats)
    state = preplay.batched_initial_state(8, CFG)

    results = {}
    for label, tp in (("dp8_tp1", 1), ("dp4_tp2", 2)):
        mesh = preplay.make_mesh(8, tp=tp)
        step = preplay.make_sharded_step(mesh, CFG)
        data_spec = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("dp")
        )
        st = jax.device_put(state, data_spec)
        ft = jax.device_put(f0, data_spec)
        compiled = step.lower(st, ft).compile()
        st1, out = compiled(st, ft)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 4
        for _ in range(n):
            r = compiled(st, ft)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / n * 1000
        results[label] = {
            "step_ms": round(ms, 1),
            "collectives_in_hlo": _collective_count(compiled),
            "pose": np.asarray(out.pose_integrated),
        }
        print(json.dumps({
            "label": label, "step_ms": results[label]["step_ms"],
            "collectives_in_hlo": results[label]["collectives_in_hlo"],
        }), flush=True)

    np.testing.assert_allclose(
        results["dp8_tp1"]["pose"], results["dp4_tp2"]["pose"], atol=5e-4
    )
    print(json.dumps({
        "correctness": "dp8_tp1 == dp4_tp2 within 5e-4",
        "tp_overhead_x": round(
            results["dp4_tp2"]["step_ms"] / results["dp8_tp1"]["step_ms"], 2
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
