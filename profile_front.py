"""Frontend internals timing on the current backend."""
import sys, time, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/loam_jax_cache")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import _cfg, _data
from loam_tpu import frontend
from loam_tpu.ops import features as FT

def timeit(fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = _cfg(half=True)
raw_np, msk_np = _data(cfg, B, 2)
raw, msk = jnp.asarray(raw_np[:, 1]), jnp.asarray(msk_np[:, 1])

ingest = jax.jit(jax.vmap(lambda x, m: frontend.ingest_sweep(x, m, cfg)))
sweep = ingest(raw, msk)
jax.block_until_ready(sweep)

def parts(sw):
    counts = jnp.sum(sw.mask.astype(jnp.int32), axis=1)
    curv, _ = jax.vmap(FT.ring_curvature)(sw.xyz, counts)
    n_scans, W = sw.mask.shape
    flat_mask0 = sw.mask.reshape(-1)
    flat_xyz0 = sw.xyz.reshape(-1, 3)
    pos0 = jnp.cumsum(flat_mask0.astype(jnp.int32)) - 1
    slot0 = jnp.where(flat_mask0, pos0, n_scans * W)
    xyz_c = jnp.zeros((n_scans * W + 1, 3), flat_xyz0.dtype).at[slot0].set(flat_xyz0)[:-1]
    n_total = jnp.sum(flat_mask0.astype(jnp.int32))
    picked_c, _ = FT.ring_prefilter(xyz_c, n_total, cfg)
    ring_starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    gather_idx = ring_starts[:, None] + jnp.arange(W)[None, :]
    pre_picked = picked_c[jnp.clip(gather_idx, 0, n_scans * W - 1)] & sw.mask
    gap_sq = jax.vmap(FT.ring_gaps)(sw.xyz)
    return counts, curv, pre_picked, gap_sq

prep = jax.jit(jax.vmap(parts))
counts, curv, pre_picked, gap_sq = prep(sweep)
jax.block_until_ready(curv)

sel = jax.jit(jax.vmap(jax.vmap(lambda x, c, g, p, n: FT.select_ring(x, c, g, p, n, cfg))))
lab = sel(sweep.xyz, curv, gap_sq, pre_picked, counts)
jax.block_until_ready(lab)

full = jax.jit(jax.vmap(lambda x, m: FT.extract_features(frontend.ingest_sweep(x, m, cfg), cfg)))
f = full(raw, msk)
jax.block_until_ready(f)

print(f"B={B} backend={jax.default_backend()}")
print(f"ingest          {timeit(lambda: ingest(raw, msk)):8.1f} ms")
print(f"prep (curv+pref){timeit(lambda: prep(sweep)):8.1f} ms")
print(f"select_ring     {timeit(lambda: sel(sweep.xyz, curv, gap_sq, pre_picked, counts)):8.1f} ms")
print(f"full frontend   {timeit(lambda: full(raw, msk)):8.1f} ms")
