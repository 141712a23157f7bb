"""On-chip validation of the Pallas selection-walk kernel: compiled
parity vs the XLA select_ring path + timing, on the real TPU."""
import dataclasses, sys, time, os
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import _cfg, _data
from loam_tpu import frontend
from loam_tpu.ops.features import extract_features

def timeit(fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
# force the kernel path (the production default is the measured-fastest
# XLA walk; this script validates the Pallas alternative stays correct)
cfg_k = dataclasses.replace(_cfg(half=True), select_argmax=False,
                            select_walk_kernel=True)
cfg_x = dataclasses.replace(cfg_k, select_walk_kernel=False)
raw_np, msk_np = _data(cfg_k, B, 2)
raw, msk = jnp.asarray(raw_np[:, 1]), jnp.asarray(msk_np[:, 1])

# 1) the round-3 failure mode: bench.py's DOUBLE vmap (scenarios AND
# frames) must COMPILE on the real chip at the exact bench shapes.
F = 17
N = raw_np.shape[2]
front2 = jax.jit(jax.vmap(jax.vmap(
    lambda x, m: extract_features(frontend.ingest_sweep(x, m, cfg_k), cfg_k)
)))
front2.lower(
    jax.ShapeDtypeStruct((B, F, N, 3), jnp.float32),
    jax.ShapeDtypeStruct((B, F, N), jnp.bool_),
).compile()
print(f"double-vmap compile OK at (B={B}, F={F}, N={N})")

fk = jax.jit(jax.vmap(lambda x, m: extract_features(frontend.ingest_sweep(x, m, cfg_k), cfg_k)))
fx = jax.jit(jax.vmap(lambda x, m: extract_features(frontend.ingest_sweep(x, m, cfg_x), cfg_x)))
a = fk(raw, msk); jax.block_until_ready(a)
b = fx(raw, msk); jax.block_until_ready(b)

ok = True
for name in ("sharp", "less_sharp", "flat", "less_flat"):
    ca, cb = getattr(a, name), getattr(b, name)
    same_m = np.array_equal(np.asarray(ca.mask), np.asarray(cb.mask))
    same_x = np.allclose(np.asarray(ca.xyz), np.asarray(cb.xyz))
    print(f"{name}: mask_equal={same_m} xyz_close={same_x} n={int(ca.mask.sum())}")
    ok = ok and same_m and same_x
print(f"frontend kernel  {timeit(lambda: fk(raw, msk)):7.1f} ms")
print(f"frontend xla     {timeit(lambda: fx(raw, msk)):7.1f} ms")
print("PARITY OK" if ok else "PARITY FAIL")
