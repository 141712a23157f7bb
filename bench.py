"""Benchmark: scan-matches/sec/chip on the full pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

A "scan match" = one frame through the full estimation core (scan-to-scan
odometry GN + the skip-frame-cadenced scan-to-map GN + integration) — the
work the reference performs at 10 Hz on ~2 CPU cores (BASELINE.md).
vs_baseline is the speedup over that 10 scan-matches/sec envelope.

Scenario-batched (DP) replay fills the chip: B independent synthetic
sequences advance in lockstep through one jitted vmapped pipeline step
(host frame loop — compile once, reuse every frame; the persistent
compilation cache makes reruns start fast).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/loam_jax_cache")


def main():
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from loam_tpu.config import LoamConfig
    from loam_tpu.io import synth
    from loam_tpu import frontend, pipeline
    from loam_tpu.ops.features import extract_features

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    cfg = dataclasses.replace(
        LoamConfig(),
        ring_width=1024,
        odom_y_scale=1.0,
        odom_weight_start_iter=0,
        corner_table_size=1 << 14,
        surf_table_size=1 << 15,
        search_buckets=1 << 12,
        max_corner_from_map=8192,
        max_surf_from_map=16384,
    )

    # host-side synthetic scenario generation (not timed)
    rng = np.random.default_rng(0)
    raws, msks = [], []
    for b in range(B):
        world = synth.make_world(seed=int(rng.integers(1 << 30)))
        poses = synth.straight_trajectory(
            F, speed=float(rng.uniform(0.6, 1.4)),
            yaw_rate=float(rng.uniform(-0.15, 0.15)),
        )
        poses = np.vstack([poses[:1], poses])[: F + 1]
        xs, ms = [], []
        for k in range(F):
            xyz, m = synth.simulate_sweep(
                world, poses[k], poses[k + 1], n_azimuth=900, seed=b * F + k
            )
            xs.append(xyz)
            ms.append(m)
        raws.append(np.stack(xs))
        msks.append(np.stack(ms))
    raw = jnp.asarray(np.stack(raws))
    msk = jnp.asarray(np.stack(msks))

    # frontend: one compile for a (B,) batch of sweeps, host loop over F
    front = jax.jit(
        jax.vmap(
            lambda x, m: extract_features(
                frontend.ingest_sweep(x, m, cfg), cfg
            )
        )
    )
    feats_frames = [front(raw[:, k], msk[:, k]) for k in range(F)]
    jax.block_until_ready(feats_frames[-1])

    # estimation core: one compile of the batched step, host frame loop
    step = jax.jit(
        jax.vmap(lambda s, f: pipeline.pipeline_step(s, f, None, cfg))
    )
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape),
        pipeline.PipelineState.create(cfg),
    )
    state, out = step(state, feats_frames[0])  # compile + warm
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for k in range(1, F):
        state, out = step(state, feats_frames[k])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    matches_per_sec = B * (F - 1) / dt
    n_chips = max(
        1, len([d for d in jax.devices() if d.platform != "cpu"]) or 1
    )
    value = matches_per_sec / n_chips
    print(json.dumps({
        "metric": "scan-matches/sec/chip",
        "value": round(value, 2),
        "unit": "frames/s",
        "vs_baseline": round(value / 10.0, 2),
    }))


if __name__ == "__main__":
    main()
