"""Frontend TAIL timing: feature-cloud compaction + less-flat voxel
downsample — the part profile_front.py showed scaling 37x for 16x batch."""
import sys, time, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/loam_jax_cache")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import _cfg, _data
from loam_tpu import frontend
from loam_tpu.ops import features as FT
from loam_tpu.ops.voxel import voxel_downsample

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
rng = np.random.default_rng(0)
lab_np = rng.choice(np.array([0, 1, 2, -1], np.int8), size=(B, 16, cfg.ring_width), p=[0.7, 0.1, 0.05, 0.15])
labels = jnp.asarray(lab_np)

def compacts(sw, labels):
    flat_xyz = sw.xyz.reshape(-1, 3)
    flat_rel = sw.rel.reshape(-1)
    lab = labels.reshape(-1)
    a = FT._compact(flat_xyz, flat_rel, lab == 2, cfg.max_sharp)
    b = FT._compact(flat_xyz, flat_rel, lab >= 1, cfg.max_less_sharp)
    c = FT._compact(flat_xyz, flat_rel, lab == -1, cfg.max_flat)
    return a, b, c

def ring_ds(sw, labels):
    counts = jnp.sum(sw.mask.astype(jnp.int32), axis=1)
    idx = jnp.arange(cfg.ring_width)[None, :]
    selectable = (idx >= 5) & (idx <= (counts[:, None] - 6)) & sw.mask
    lf_mask = selectable & (labels <= 0)
    def one(x, r, m):
        return voxel_downsample(x, m, cfg.less_flat_leaf, cfg.less_flat_ring_cap, extra=r)
    lf_xyz, lf_rel, lf_m = jax.vmap(one)(sw.xyz, sw.rel, lf_mask)
    return lf_xyz, lf_rel, lf_m

def lf_compact(lf):
    lf_xyz, lf_rel, lf_m = lf
    return FT._compact(lf_xyz.reshape(-1, 3), lf_rel.reshape(-1), lf_m.reshape(-1), cfg.max_less_flat)

jc = jax.jit(jax.vmap(compacts))
jr = jax.jit(jax.vmap(ring_ds))
jlc = jax.jit(jax.vmap(lf_compact))
lf = jr(sweep, labels)
jax.block_until_ready(lf)
print(f"B={B}")
print(f"3x feature _compact  {timeit(lambda: jc(sweep, labels)):8.1f} ms")
print(f"ring voxel downsample{timeit(lambda: jr(sweep, labels)):8.1f} ms")
print(f"less-flat _compact   {timeit(lambda: jlc(lf)):8.1f} ms")
