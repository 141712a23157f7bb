"""kNN kernel tile-size sweep on the real chip."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from loam_tpu.ops.pallas.knn_topk import knn_topk, knn_topk_dyn

def timeit(fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000

B, Q, M = 8, 8192, 16384
n_live_q, n_live_m = 4689, 6619
rng = np.random.default_rng(0)
q = jnp.asarray(rng.uniform(-30, 30, size=(B, Q, 3)).astype(np.float32))
r = jnp.asarray(rng.uniform(-30, 30, size=(B, M, 3)).astype(np.float32))
rmask = jnp.arange(M)[None, :].repeat(B, 0) < n_live_m

for tq in (128, 256, 512):
    for tm in (512, 1024, 2048):
        f = jax.jit(jax.vmap(lambda qq, rr, mm: knn_topk(
            qq, None, rr, mm, 5, tq=tq, tm=tm, n_ref=jnp.int32(n_live_m))))
        try:
            t = timeit(lambda: f(q, r, rmask))
            print(f"static tq={tq} tm={tm}: {t:6.2f} ms")
        except Exception as e:
            print(f"static tq={tq} tm={tm}: FAIL {type(e).__name__}")

for tq in (128, 256, 512):
    for tm in (512, 1024, 2048):
        f = jax.jit(jax.vmap(lambda qq, rr, mm: knn_topk_dyn(
            qq, rr, mm, jnp.int32(n_live_q), jnp.int32(n_live_m), 5, tq=tq, tm=tm)))
        try:
            t = timeit(lambda: f(q, r, rmask))
            print(f"dyn    tq={tq} tm={tm}: {t:6.2f} ms")
        except Exception as e:
            print(f"dyn    tq={tq} tm={tm}: FAIL {type(e).__name__}")
