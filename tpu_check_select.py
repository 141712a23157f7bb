"""On-chip A/B/C of the three greedy-selection strategies at bench
shapes: frontend (ingest + extract_features) ms per batched call, over
B scenarios x F frames.  Decides config.select_argmax / select_walk_kernel
defaults with measurements instead of vibes."""
import dataclasses, sys, time
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import _cfg, _data
from loam_tpu import frontend
from loam_tpu.ops.features import extract_features


def timeit(fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


F = int(sys.argv[1]) if len(sys.argv) > 1 else 17
paths = {
    "argmax": dict(select_argmax=True),
    "walk_kernel": dict(select_argmax=False, select_walk_kernel=True),
    "xla_while": dict(select_argmax=False, select_walk_kernel=False),
}
print(f"frontend ms per batched call (F={F} frames folded in)")
print("| B | " + " | ".join(paths) + " |")
for B in (8, 32, 128):
    raw_np, msk_np = _data(_cfg(half=True), B, F)
    raw, msk = jnp.asarray(raw_np), jnp.asarray(msk_np)
    row = []
    for name, kw in paths.items():
        cfg = dataclasses.replace(_cfg(half=True), **kw)
        f = jax.jit(jax.vmap(jax.vmap(
            lambda x, m: extract_features(frontend.ingest_sweep(x, m, cfg), cfg)
        )))
        row.append(f"{timeit(lambda: f(raw, msk)):.1f}")
    print(f"| {B} | " + " | ".join(row) + " |", flush=True)
