"""Frontend batch-superlinearity A/B (VERDICT r4 #3).

Diagnosis: the greedy-selection while_loop is batched over (B*F, 16)
rings, so every lane pays the WORST lane's trip count; E[max] grows with
the batch, which is the measured 22x frontend cost for a 16x batch.

Candidate fix: chunk the scenario axis with lax.map — each chunk's
while_loop stops at its own max, trading a little dispatch overhead for
a much smaller worst-lane penalty, while (chunk*F*16, W) rows still fill
the VPU.

    python profile_front_chunk.py [B] [--full]
"""

import json
import sys
import time

import numpy as np

import bench


def main():
    args = sys.argv[1:]
    B = int(args[0]) if args and not args[0].startswith("--") else 128
    half = "--full" not in args
    import jax
    import jax.numpy as jnp

    bench._enable_cache()
    from loam_tpu import frontend
    from loam_tpu.ops.features import extract_features

    cfg = bench._cfg(half=half)
    F = 17
    raw_np, msk_np = bench._data(cfg, B, F)
    raw = jnp.asarray(raw_np)
    msk = jnp.asarray(msk_np)

    def one(x, m):
        return extract_features(frontend.ingest_sweep(x, m, cfg), cfg)

    vv = jax.vmap(jax.vmap(one))

    def build(chunk):
        if chunk >= B:
            return jax.jit(vv)

        def body(xs):
            return vv(*xs)

        def fn(x, m):
            n = B // chunk
            out = jax.lax.map(
                body,
                (x.reshape((n, chunk) + x.shape[1:]),
                 m.reshape((n, chunk) + m.shape[1:])),
            )
            return jax.tree_util.tree_map(
                lambda o: o.reshape((B,) + o.shape[2:]), out
            )

        return jax.jit(fn)

    for chunk in (B, 32, 8):
        if chunk > B:
            continue
        fn = build(chunk)
        out = fn(raw, msk)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 4
        for _ in range(n):
            r = fn(raw, msk)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / n * 1000
        print(json.dumps({
            "B": B, "half": half, "chunk": chunk,
            "frontend_ms_per_step": round(ms / F, 2),
            "total_ms": round(ms, 1),
        }), flush=True)
        del fn, out, r


if __name__ == "__main__":
    main()
