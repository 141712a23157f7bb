"""Micro-benchmark of masked-compaction strategies on the chip.

Compaction (stable move of masked elements to the front of a fixed
capacity) is the frontend/mapping glue op; profile_tail.py r4 showed the
scatter form scaling 67x for 16x batch.  Candidates:
  scatter       .at[slot].set            (the original)
  searchsorted  binary-search gather      (scan + sort methods)
  sortpay       one stable lax.sort by ~mask with payload columns
"""
import sys, time, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/loam_jax_cache")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def timeit(fn, *a, n=10):
    f = jax.jit(fn)
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000

def scatter(xyz, rel, mask, cap):
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
    slot = jnp.where(mask & (pos < cap), pos, cap)
    B = xyz.shape[0]
    def one(x, r, m, s):
        ox = jnp.zeros((cap + 1, 3), x.dtype).at[s].set(x)
        orl = jnp.zeros((cap + 1,), r.dtype).at[s].set(r)
        om = jnp.zeros((cap + 1,), bool).at[s].set(m)
        return ox[:cap], orl[:cap], om[:cap]
    return jax.vmap(one)(xyz, rel, mask, slot)

def ssorted(method):
    def f(xyz, rel, mask, cap):
        def one(x, r, m):
            pos = jnp.cumsum(m.astype(jnp.int32))
            j = jnp.arange(cap)
            src = jnp.clip(jnp.searchsorted(pos, j + 1, side="left",
                                            method=method), 0, m.shape[0] - 1)
            ok = j < pos[-1]
            return jnp.where(ok[:, None], x[src], 0.), jnp.where(ok, r[src], 0.), ok
        return jax.vmap(one)(xyz, rel, mask)
    return f

def sortpay(xyz, rel, mask, cap):
    def one(x, r, m):
        key = (~m).astype(jnp.int32)
        _, xs, ys, zs, rs, ms = jax.lax.sort(
            (key, x[:, 0], x[:, 1], x[:, 2], r, m.astype(jnp.int32)),
            num_keys=1, is_stable=True,
        )
        ok = ms[:cap] == 1
        ox = jnp.stack([xs[:cap], ys[:cap], zs[:cap]], -1)
        return jnp.where(ok[:, None], ox, 0.), jnp.where(ok, rs[:cap], 0.), ok
    return jax.vmap(one)(xyz, rel, mask)

rng = np.random.default_rng(0)
for (B, N, cap) in ((128, 16384, 16384), (2048, 1024, 1024), (8, 16384, 16384)):
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(B, N)) < 0.6)
    row = [f"B={B} N={N} cap={cap}:"]
    for name, fn in (("scatter", scatter), ("ss_scan", ssorted("scan")),
                     ("ss_sort", ssorted("sort")), ("sortpay", sortpay)):
        try:
            ms = timeit(lambda x, r, m: fn(x, r, m, cap), xyz, rel, mask)
            row.append(f"{name} {ms:7.1f}ms")
        except Exception as e:
            row.append(f"{name} FAIL({type(e).__name__})")
    print("  ".join(row), flush=True)
