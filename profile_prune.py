"""A/B of the spatial tile pruning in the exact mapping kNN
(config.map_knn_prune) on the real chip, at the fused mapping-frame
level (the rule from round 4: micro-benchmarks of irregular ops mislead;
measure the full jitted step).

    python profile_prune.py [B] [--full]
"""

import dataclasses
import json
import sys
import time

import numpy as np

import bench


def main():
    args = sys.argv[1:]
    B = int(args[0]) if args and not args[0].startswith("--") else 8
    half = "--full" not in args
    import jax
    import jax.numpy as jnp

    bench._enable_cache()
    from loam_tpu import frontend, pipeline
    from loam_tpu.ops.features import extract_features

    F = 3
    base = bench._cfg(half=half)
    raw_np, msk_np = bench._data(base, B, F)
    raw = jnp.asarray(raw_np)
    msk = jnp.asarray(msk_np)

    for label, cfg in (
        ("strict_prune", base),
        ("strict_noprune", dataclasses.replace(base, map_knn_prune=False)),
        # knn_regather_drift=0: under vmap the drift lax.cond executes
        # BOTH branches, so leaving it on pays the full gather every
        # iteration (measured 286 ms vs 202 strict); rounds already
        # bound cache staleness to `every` iterations
        ("hybrid5_prune",
         dataclasses.replace(base, map_exact_regather_every=5,
                             knn_regather_drift=0.0)),
    ):
        front = jax.jit(jax.vmap(jax.vmap(
            lambda x, m: extract_features(frontend.ingest_sweep(x, m, cfg),
                                          cfg)
        )))
        step_map = jax.jit(jax.vmap(
            lambda s, f: pipeline.pipeline_step(s, f, None, cfg,
                                                do_mapping=True)
        ))
        step_nomap = jax.jit(jax.vmap(
            lambda s, f: pipeline.pipeline_step(s, f, None, cfg,
                                                do_mapping=False)
        ))
        fall = front(raw, msk)
        state0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape),
            pipeline.PipelineState.create(cfg),
        )
        f0 = jax.tree_util.tree_map(lambda x: x[:, 0], fall)
        feats = jax.tree_util.tree_map(lambda x: x[:, 1], fall)
        state1, _ = step_nomap(state0, f0)
        out = step_map(state1, feats)
        jax.block_until_ready(out)
        probe = np.asarray(out[1].pose_aft)
        assert np.isfinite(probe).all(), "non-finite mapping poses"

        t0 = time.perf_counter()
        n = 8
        for _ in range(n):
            r = step_map(state1, feats)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / n * 1000
        print(json.dumps({
            "label": label, "B": B, "half": half,
            "step_map_ms": round(ms, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
