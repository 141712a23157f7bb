"""Per-stage timing on the current backend (run on the real TPU).

Times, at B scenarios: frontend, odometry_step alone, mapping_step alone,
the mapping kNN kernel alone, and the full pipeline_step — to locate where
the step budget goes.  Not part of the test suite; a scratch tool.
"""

import dataclasses
import sys
import time

import numpy as np

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/loam_jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _cfg, _data
from loam_tpu import frontend, pipeline, odometry, mapping
from loam_tpu.ops.features import extract_features


def timeit(fn, n=8):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    F = 6
    cfg = _cfg(half=True)
    raw_np, msk_np = _data(cfg, B, F)
    raw = jnp.asarray(raw_np)
    msk = jnp.asarray(msk_np)

    front = jax.jit(jax.vmap(
        lambda x, m: extract_features(frontend.ingest_sweep(x, m, cfg), cfg)
    ))
    step = jax.jit(jax.vmap(
        lambda s, f: pipeline.pipeline_step(s, f, None, cfg)
    ))
    odom_only = jax.jit(jax.vmap(
        lambda s, f: odometry.odometry_step(s, f, None, cfg)
    ))
    map_only = jax.jit(jax.vmap(
        lambda ms, pose, cl, sl: mapping.mapping_step(ms, pose, cl, sl, None, cfg)
    ))

    state0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape),
        pipeline.PipelineState.create(cfg),
    )

    # advance a few frames so maps/clouds are populated (realistic load)
    state = state0
    for k in range(F):
        f = front(raw[:, k], msk[:, k])
        state, _ = step(state, f)
    jax.block_until_ready(state)
    feats = front(raw[:, F - 1], msk[:, F - 1])

    print(f"B={B} backend={jax.default_backend()}")
    print(f"frontend        {timeit(lambda: front(raw[:, 2], msk[:, 2])):8.1f} ms")
    print(f"pipeline_step   {timeit(lambda: step(state, feats)):8.1f} ms")

    os_, oo = odom_only(state.odom, feats)
    jax.block_until_ready(oo)
    print(f"odometry_step   {timeit(lambda: odom_only(state.odom, feats)):8.1f} ms")
    print(f"mapping_step    {timeit(lambda: map_only(state.map, oo.pose, oo.corner_last, oo.surf_last)):8.1f} ms")

    # mapping kNN kernel alone: stacks vs compacted local map, one call
    from loam_tpu import map_store
    from loam_tpu.ops.pallas.knn_topk import knn_points

    ms0 = jax.tree_util.tree_map(lambda x: x[0], state.map)
    tobe = np.zeros(6, np.float32)
    center = jnp.zeros(3, jnp.int32)
    fov = map_store.local_cube_fov(center, jnp.asarray(tobe), cfg)
    lm = map_store.local_map_points(ms0.surf_map, center, fov,
                                    cfg.max_surf_from_map, cfg)
    q = jax.tree_util.tree_map(lambda x: x[0], oo.surf_last)
    knn = jax.jit(lambda qx, qm: knn_points(qx, qm, lm.xyz, lm.mask, 5))
    print(f"knn surf x1(B=1){timeit(lambda: knn(q.xyz, q.mask)):8.1f} ms"
          f"   (Q={q.xyz.shape[0]} M={lm.xyz.shape[0]} n_local={int(lm.n_local)})")

    knnB = jax.jit(jax.vmap(lambda qx, qm: knn_points(qx, qm, lm.xyz, lm.mask, 5)))
    qB = oo.surf_last
    print(f"knn surf vmapB  {timeit(lambda: knnB(qB.xyz, qB.mask)):8.1f} ms")


if __name__ == "__main__":
    main()
