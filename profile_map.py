"""Fine-grained mapping profile on the current backend."""
import dataclasses, sys, time, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/loam_jax_cache")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import _cfg, _data
from loam_tpu import frontend, pipeline, odometry, mapping, map_store
from loam_tpu.utils import rotations
from loam_tpu.ops.features import extract_features

def timeit(fn, n=8):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
F = 6
cfg = _cfg(half=True)
raw_np, msk_np = _data(cfg, B, F)
raw, msk = jnp.asarray(raw_np), jnp.asarray(msk_np)
front = jax.jit(jax.vmap(lambda x, m: extract_features(frontend.ingest_sweep(x, m, cfg), cfg)))
step = jax.jit(jax.vmap(lambda s, f: pipeline.pipeline_step(s, f, None, cfg)))
state = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), pipeline.PipelineState.create(cfg))
for k in range(F):
    f = front(raw[:, k], msk[:, k])
    state, _ = step(state, f)
jax.block_until_ready(state)
feats = front(raw[:, F-1], msk[:, F-1])
odom_only = jax.jit(jax.vmap(lambda s, f: odometry.odometry_step(s, f, None, cfg)))
os_, oo = odom_only(state.odom, feats)
jax.block_until_ready(oo)

map_only = jax.jit(jax.vmap(lambda ms, p, cl, sl: mapping.mapping_step(ms, p, cl, sl, None, cfg)))

def scaffold(ms, pose_sum, corner_last, surf_last):
    """mapping_step minus the GN solve (prior, downsample, evict, fov,
    local map assembly, insert at the prior pose)."""
    tobe = rotations.transform_associate_to_map(pose_sum, ms.transform_bef, ms.transform_aft)
    cstack = mapping._downsample_cloud(corner_last, cfg.map_corner_leaf, cfg.max_corner_stack)
    sstack = mapping._downsample_cloud(surf_last, cfg.map_surf_leaf, cfg.max_surf_stack)
    center = jnp.floor((tobe[3:] + 25.0) / 50.0).astype(jnp.int32)
    cmap = map_store.evict_outside_window(ms.corner_map, center, cfg)
    smap = map_store.evict_outside_window(ms.surf_map, center, cfg)
    fov = map_store.local_cube_fov(center, tobe, cfg)
    cloc = map_store.local_map_points(cmap, center, fov, cfg.max_corner_from_map, cfg)
    sloc = map_store.local_map_points(smap, center, fov, cfg.max_surf_from_map, cfg)
    def ins(table, stack, cap):
        world = rotations.apply_pose(tobe, stack.xyz)
        hi, lo, sums, cnts, valid = map_store.aggregate_by_voxel(world, stack.mask, cfg.map_corner_leaf, cap)
        return map_store.table_insert(table, hi, lo, sums, cnts, valid, cfg)
    cmap = ins(cmap, cstack, cfg.max_corner_stack)
    smap = ins(smap, sstack, cfg.max_surf_stack)
    return cloc.n_local, sloc.n_local, cmap.cnt.sum(), smap.cnt.sum(), cstack.mask.sum(), sstack.mask.sum()

scaf = jax.jit(jax.vmap(scaffold))
r = scaf(state.map, oo.pose, oo.corner_last, oo.surf_last)
jax.block_until_ready(r)
print(f"B={B} backend={jax.default_backend()}")
print(f"n_local corner={int(r[0][0])} surf={int(r[1][0])} stack live c={int(r[4][0])} s={int(r[5][0])}")
print(f"frontend       {timeit(lambda: front(raw[:, 2], msk[:, 2])):8.1f} ms")
print(f"odometry_step  {timeit(lambda: odom_only(state.odom, feats)):8.1f} ms")
print(f"map scaffold   {timeit(lambda: scaf(state.map, oo.pose, oo.corner_last, oo.surf_last)):8.1f} ms")
print(f"mapping_step   {timeit(lambda: map_only(state.map, oo.pose, oo.corner_last, oo.surf_last)):8.1f} ms")

# kNN alone with dyn kernel at true sizes
from loam_tpu.ops.pallas.knn_topk import knn_points
ms0 = jax.tree_util.tree_map(lambda x: x[0], state.map)
tobe0 = rotations.transform_associate_to_map(oo.pose[0], ms0.transform_bef, ms0.transform_aft)
center = jnp.floor((tobe0[3:] + 25.0) / 50.0).astype(jnp.int32)
fov = map_store.local_cube_fov(center, tobe0, cfg)
sloc = map_store.local_map_points(ms0.surf_map, center, fov, cfg.max_surf_from_map, cfg)
sstack = mapping._downsample_cloud(jax.tree_util.tree_map(lambda x: x[0], oo.surf_last), cfg.map_surf_leaf, cfg.max_surf_stack)
nq = jnp.sum(sstack.mask.astype(jnp.int32))
knn_dynB = jax.jit(jax.vmap(lambda qx, qm: knn_points(qx, None, sloc.xyz, sloc.mask, 5, n_q=nq)))
qB = jnp.broadcast_to(sstack.xyz, (B,) + sstack.xyz.shape)
print(f"knn dyn surf vmapB {timeit(lambda: knn_dynB(qB, None)):6.1f} ms  (nq={int(nq)} nref={int(sloc.n_local)})")
knn_statB = jax.jit(jax.vmap(lambda qx: knn_points(qx, None, sloc.xyz, sloc.mask, 5)))
print(f"knn static surf vmapB {timeit(lambda: knn_statB(qB)):3.1f} ms")
