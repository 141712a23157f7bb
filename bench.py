"""Benchmark: scan-matches/sec/chip on the full pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

A "scan match" = one frame through the WHOLE per-sweep pipeline —
frontend (ingest + feature extraction) + scan-to-scan odometry GN + the
skip-frame-cadenced scan-to-map GN + integration — the work the reference
performs at 10 Hz on ~2 CPU cores (BASELINE.md).

The headline run is at the reference's TRUE per-sweep load — full VLP-16
density (ring_width=2048, 1800 azimuth steps, ~28k raw points;
/root/reference/src/scanRegistration.cpp:63-66 caps the cloud at 40000)
with reference-default behavior knobs (odom_y_scale=1.05,
odom_weight_start_iter=5).  ``--half`` reproduces the round-2..4
half-density bench config (ring_width=1024, 900 steps, y_scale=1.0,
weight_start=0) for continuity with earlier driver artifacts.

Scenario-batched (DP) replay fills the chip: B independent synthetic
sequences advance in lockstep through one jitted vmapped pipeline step
(host frame loop — compile once, reuse every frame; the persistent
compilation cache makes reruns start fast).

    python bench.py            # headline (full-density), one JSON line
    python bench.py --half     # legacy half-density config
    python bench.py --table    # B x density sweep + stage table -> BENCH.md
    python bench.py --ab       # bench-knob A/B (weight schedule, y-scale)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/loam_jax_cache")


def _enable_cache():
    """Persistent compile cache.  This jax build ignores the
    JAX_COMPILATION_CACHE_DIR env var — only the config update takes
    effect (verified: env-var-only runs never created the directory)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _cfg(half: bool = False, y_scale: float | None = None,
         weight_start: int | None = None, regather: int = 5):
    """Bench config.  Default = FULL VLP-16 density with
    reference-default behavior knobs and the hybrid exact-kNN cadence
    (the TPU production fast mode); half=True = the round-2..4 bench
    config (~half the sensor's per-sweep load, convergence weighting
    from iteration 0); regather=1 = the reference's strict
    per-iteration kd re-query semantics.

    Hybrid accuracy contract: the 5 cm golden-oracle gate
    (tests/test_golden_parity.py::test_exact_knn_hybrid_parity) and the
    figure8 drift baseline 1.10% vs <1% strict
    (tests/test_long_sequence.py)."""
    from loam_tpu.config import LoamConfig

    over = dict(
        corner_table_size=1 << 14,
        surf_table_size=1 << 15,
        search_buckets=1 << 12,
        max_corner_from_map=8192,
        max_surf_from_map=16384,
        # production mapping-kNN path: the fused exact Pallas knn_topk
        # kernel (the reference's kd semantics,
        # src/laserMapping.cpp:717,824), re-queried every `regather`
        # iterations with kselect re-rank in between.  The cached
        # 27-cell candidate gather (map_exact_knn=False) stays a config
        # option for CPU/huge-map runs, not the TPU default.
        map_exact_knn=True,
        map_exact_regather_every=regather,
        # under vmap the drift-triggered mid-round re-gather's lax.cond
        # executes BOTH branches (measured: 286 vs 202 ms/map-frame);
        # rounds bound cache staleness to `regather` iterations anyway
        knn_regather_drift=0.0,
    )
    if half:
        over.update(
            ring_width=1024, odom_y_scale=1.0, odom_weight_start_iter=0
        )
    if y_scale is not None:
        over["odom_y_scale"] = y_scale
    if weight_start is not None:
        over["odom_weight_start_iter"] = weight_start
    return dataclasses.replace(LoamConfig(), **over)


def _n_azimuth(cfg) -> int:
    """Synthetic sweep azimuth steps: the VLP-16 emits ~1800 per ring at
    10 Hz; the half-density legacy config uses 900."""
    return 900 if cfg.ring_width <= 1024 else 1800


_DATA_CACHE: dict = {}


def _data(cfg, B, F):
    """B scenarios of F sweeps.  Host-side ray casting is slow on this
    container's 2 cores, so at most 8 unique scenarios are generated and
    tiled — the device still sees B independent state streams (identical
    inputs don't change the work performed).  The unique scenarios are
    cached per (azimuth, F) within the process: the B sweep of --table
    reuses one generation."""
    from loam_tpu.io import synth

    uniq = min(B, 8)
    na = _n_azimuth(cfg)
    key = (na, F, uniq)
    disk = f"/tmp/loam_bench_data_{na}_{F}_{uniq}.npz"
    if key not in _DATA_CACHE and os.path.exists(disk):
        try:
            z = np.load(disk)
            _DATA_CACHE[key] = (z["raw"], z["msk"])
        except Exception:
            pass
    if key in _DATA_CACHE:
        raw, msk = _DATA_CACHE[key]
        if B > uniq:
            reps = -(-B // uniq)
            return (np.tile(raw, (reps, 1, 1, 1))[:B],
                    np.tile(msk, (reps, 1, 1))[:B])
        return raw[:B], msk[:B]
    rng = np.random.default_rng(0)
    raws, msks = [], []
    for b in range(uniq):
        world = synth.make_world(seed=int(rng.integers(1 << 30)))
        poses = synth.straight_trajectory(
            F, speed=float(rng.uniform(0.6, 1.4)),
            yaw_rate=float(rng.uniform(-0.15, 0.15)),
        )
        poses = np.vstack([poses[:1], poses])[: F + 1]
        xs, ms = [], []
        for k in range(F):
            xyz, m = synth.simulate_sweep(
                world, poses[k], poses[k + 1], n_azimuth=na, seed=b * F + k
            )
            xs.append(xyz)
            ms.append(m)
        raws.append(np.stack(xs))
        msks.append(np.stack(ms))
    raw = np.stack(raws)
    msk = np.stack(msks)
    _DATA_CACHE[key] = (raw, msk)
    try:
        np.savez_compressed(disk, raw=raw, msk=msk)
    except OSError:
        pass
    if B > uniq:
        reps = -(-B // uniq)
        raw = np.tile(raw, (reps, 1, 1, 1))[:B]
        msk = np.tile(msk, (reps, 1, 1))[:B]
    return raw, msk


def run_once(B: int, F: int, cfg=None, per_stage: bool = False,
             chunk: int | None = None):
    """Returns dict with rates (and per-stage ms when requested).

    chunk: scenario-chunked dispatch — lax.map over chunks of the
    scenario axis for BOTH the frontend and the recurrent core.  The
    math is identical; what changes is that each chunk's batched
    while_loops (greedy selection, GN solves) stop at the chunk's OWN
    worst lane instead of the global batch's.  Measured at B=128 half
    density: frontend 840 -> 631 ms/step at chunk=8 (~linear in B,
    VERDICT r4 #3)."""
    import jax

    _enable_cache()
    import jax.numpy as jnp

    from loam_tpu import frontend, pipeline
    from loam_tpu.ops.features import extract_features, selection_report

    if cfg is None:
        cfg = _cfg()
    period = cfg.skip_frame_num + 1
    assert (F - 1) % period == 0, f"F={F} must be 1 + n*{period}"
    raw_np, msk_np = _data(cfg, B, F)
    raw = jnp.asarray(raw_np)
    msk = jnp.asarray(msk_np)

    def chunked(fn):
        """vmap fn over the scenario axis, lax.map-ed in chunks."""
        if chunk is None or chunk >= B:
            return jax.jit(jax.vmap(fn))
        assert B % chunk == 0, (B, chunk)
        n = B // chunk

        def run(*xs):
            resh = jax.tree_util.tree_map(
                lambda x: x.reshape((n, chunk) + x.shape[1:]), xs
            )
            out = jax.lax.map(lambda c: jax.vmap(fn)(*c), resh)
            return jax.tree_util.tree_map(
                lambda o: o.reshape((B,) + o.shape[2:]), out
            )

        return jax.jit(run)

    def build(c):
        # frontend batched over scenarios AND frames: each
        # greedy-selection step of the subregion scan is inherently
        # sequential (reference semantics), so throughput comes from
        # giving every sequential step more parallel rows — (B*F, 16)
        # rings at once instead of (B, 16)
        fr = chunked(
            jax.vmap(
                lambda x, m: extract_features(
                    frontend.ingest_sweep(x, m, c), c
                )
            )
        )
        # the whole recurrent core is ONE jitted program: a lax.scan
        # whose body handles one cadence period with static do_mapping
        # flags (pipeline.replay_features_cadenced) — no per-frame host
        # dispatch, no batched lax.cond paying the mapping solve on
        # odometry-only frames
        co = chunked(lambda f: pipeline.replay_features_cadenced(f, c))
        return fr, co

    front, core = build(cfg)
    fallback_used = False

    # warm all jits.  The kernel dispatch in extract_features already
    # probes Mosaic lowering and self-degrades to the XLA path, but keep
    # a last-resort fallback here too: a benchmark run must NEVER exit
    # nonzero because one kernel regressed (round-3 postmortem).
    try:
        fall = front(raw, msk)
        outs, _ = core(fall)
        jax.block_until_ready(outs)
    except Exception as e:
        print(f"# kernel path failed ({type(e).__name__}); "
              "falling back to the XLA selection path", file=sys.stderr)
        fallback_used = True
        cfg = dataclasses.replace(cfg, select_walk_kernel=False)
        front, core = build(cfg)
        fall = front(raw, msk)
        outs, _ = core(fall)
        jax.block_until_ready(outs)

    # sanity-gate the warmup output BEFORE timing: a crashed TPU worker
    # can leave instantly-"ready" error arrays that would otherwise
    # produce a silent garbage rate (seen once in round 4: a dead
    # worker yielded total_s=0.0005)
    probe = np.asarray(outs.pose_integrated)
    if not np.isfinite(probe).all():
        raise RuntimeError("warmup produced non-finite poses")

    # free the warmup copies before timing: at B=128 full density the
    # feature pytree alone is ~2 GB of HBM, and holding warmup + timed
    # copies simultaneously overflows the chip
    del fall, outs

    t0 = time.perf_counter()
    feats_all = front(raw, msk)
    outs, _ = core(feats_all)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    if dt < 1e-3 * B:
        raise RuntimeError(
            f"implausible timing ({dt:.4f}s for {B * F} frames) — "
            "device likely unhealthy"
        )

    n_chips = max(
        1, len([d for d in jax.devices() if d.platform != "cpu"]) or 1
    )
    res = {
        "B": B,
        "F": F,
        "total_s": dt,
        "scan_matches_per_s_per_chip": B * F / dt / n_chips,
        # the config every number was measured at — no off-contract
        # figures without saying so (VERDICT r4)
        "ring_width": cfg.ring_width,
        "n_azimuth": _n_azimuth(cfg),
        "odom_y_scale": cfg.odom_y_scale,
        "odom_weight_start_iter": cfg.odom_weight_start_iter,
        "map_exact_regather_every": cfg.map_exact_regather_every,
        # which selection formulation actually ran + the Mosaic compile
        # probe outcome, so a kernel regression shows up in the driver
        # artifact instead of silently degrading (VERDICT r4 weak #5)
        "fallback_used": fallback_used,
        **selection_report(cfg),
    }

    if per_stage:
        def t(fn, n=6):
            jax.block_until_ready(fn())
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn()
            jax.block_until_ready(r)
            return (time.perf_counter() - t0) / n * 1000

        # per-stage numbers use standalone single-step jits (the
        # production path is the fused `core` scan timed above), with
        # the same scenario-chunked dispatch as the timed path
        step_map = chunked(
            lambda s, f: pipeline.pipeline_step(s, f, None, cfg,
                                                do_mapping=True)
        )
        step_nomap = chunked(
            lambda s, f: pipeline.pipeline_step(s, f, None, cfg,
                                                do_mapping=False)
        )
        state0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape),
            pipeline.PipelineState.create(cfg),
        )
        f0 = jax.tree_util.tree_map(lambda x: x[:, 0], feats_all)
        feats = jax.tree_util.tree_map(lambda x: x[:, 1], feats_all)
        state1, _ = step_nomap(state0, f0)
        # amortized per-frame frontend cost (one batched call / F)
        res["frontend_ms"] = t(lambda: front(raw, msk)) / F
        res["step_map_ms"] = t(lambda: step_map(state1, feats)[1])
        res["step_nomap_ms"] = t(lambda: step_nomap(state1, feats)[1])
    return res


_TABLE_ROWS = (
    # full density x B=128 exceeds the chip's 16 GB HBM (the feature
    # pytree alone is ~2 GB; frontend sort transients push past) — kept
    # in the sweep as the measured single-chip capacity edge; scale
    # past it by dp-sharding scenarios over chips (parallel/replay.py)
    ("full", "hybrid", (8, 32, 64, 128)),
    ("full", "strict", (8,)),
    ("half", "hybrid", (8, 32, 128)),
    ("half", "strict", (8,)),
)


def _row(density: str, mode: str, B: int, chunk: int | None = None):
    """One table row, printed as one JSON line (subprocess entry)."""
    r = run_once(
        B, F=17,
        cfg=_cfg(half=density == "half",
                 regather=1 if mode == "strict" else 5),
        per_stage=True,
        chunk=chunk,
    )
    r["chunk"] = chunk
    print(json.dumps({"density": density, "mode": mode, **r}), flush=True)


def _table():
    """Each row runs in a FRESH subprocess: a TPU OOM at one extreme
    point (full density x B=128 exceeds the chip's HBM) must neither
    poison the worker state for later rows nor lose the sweep — the
    round-4 bench crash lesson applied to the sweep level.  The
    persistent compile cache makes per-row process startup cheap."""
    import subprocess

    lines = [
        "# BENCH — single-chip throughput (real TPU)",
        "",
        "Metric: scan-matches/sec/chip over the WHOLE per-sweep "
        "pipeline (frontend + odometry + cadenced mapping + "
        "integration), scenario-batched.  Reference envelope: 10 "
        "scans/s on ~2 CPU cores (BASELINE.md).",
        "",
        "Full density = the reference's true per-sweep load "
        "(ring_width=2048, 1800 azimuth steps, ~28k raw pts, "
        "reference-default odom_y_scale=1.05 / weight_start_iter=5).  "
        "Half = the legacy round-2..4 bench config (1024/900, "
        "y_scale=1.0, weight_start=0).  Mode: hybrid = exact-kNN "
        "re-gather every 5 GN iterations + kselect re-rank (the "
        "production fast mode; 5 cm oracle gate holds — "
        "tests/test_golden_parity.py); strict = the reference's "
        "per-iteration re-query.",
        "",
        "| density | mode | B | frontend ms/step | map-frame ms | "
        "odom-frame ms | scan-matches/s/chip | vs 10 Hz envelope |",
        "|---|---|---|---|---|---|---|---|",
    ]
    here = os.path.abspath(__file__)
    for label, mode, Bs in _TABLE_ROWS:
        for B in Bs:
            p = subprocess.run(
                [sys.executable, here, "--one-row", label, mode, str(B)],
                capture_output=True, text=True, timeout=7200,
            )
            r = None
            for line in p.stdout.splitlines():
                if line.startswith("{"):
                    r = json.loads(line)
            if p.returncode != 0 or r is None:
                err = (p.stderr.strip().splitlines() or ["?"])[-1][:200]
                print(json.dumps({
                    "density": label, "mode": mode, "B": B, "error": err,
                }), flush=True)
                lines.append(f"| {label} | {mode} | {B} | — | — | — | "
                             f"failed | — |")
                continue
            lines.append(
                f"| {label} | {mode} | {B} | {r['frontend_ms']:.1f} | "
                f"{r['step_map_ms']:.1f} | {r['step_nomap_ms']:.1f} | "
                f"{r['scan_matches_per_s_per_chip']:.1f} | "
                f"{r['scan_matches_per_s_per_chip'] / 10.0:.1f}x |"
            )
            print(json.dumps(r), flush=True)
    with open(os.path.join(os.path.dirname(__file__), "BENCH.md"),
              "w") as f:
        f.write("\n".join(lines) + "\n")


def _ab():
    """A/B the two legacy bench-config knobs on the bench workload —
    quantifies the throughput effect of the round-2..4 off-default
    settings (VERDICT r4 weak #1)."""
    runs = [
        ("reference defaults (ws=5, ys=1.05)", _cfg()),
        ("weight_start=0", _cfg(weight_start=0)),
        ("y_scale=1.0", _cfg(y_scale=1.0)),
        ("both legacy knobs", _cfg(weight_start=0, y_scale=1.0)),
    ]
    for label, cfg in runs:
        r = run_once(8, F=17, cfg=cfg)
        print(json.dumps({"ab": label, **r}), flush=True)


def main():
    args = sys.argv[1:]
    if "--one-row" in args:
        i = args.index("--one-row")
        chunk = int(args[i + 4]) if len(args) > i + 4 else None
        _row(args[i + 1], args[i + 2], int(args[i + 3]), chunk)
        return
    if "--table" in args:
        _table()
        return
    if "--ab" in args:
        _ab()
        return

    half = "--half" in args
    pos = [a for a in args if not a.startswith("--")]
    B = int(pos[0]) if pos else 8
    F = int(pos[1]) if len(pos) > 1 else 17
    r = run_once(B, F, cfg=_cfg(half=half))
    value = r["scan_matches_per_s_per_chip"]
    print(json.dumps({
        "metric": "scan-matches/sec/chip",
        "value": round(value, 2),
        "unit": "frames/s",
        "vs_baseline": round(value / 10.0, 2),
        "ring_width": r["ring_width"],
        "n_azimuth": r["n_azimuth"],
        "odom_y_scale": r["odom_y_scale"],
        "odom_weight_start_iter": r["odom_weight_start_iter"],
        "map_exact_regather_every": r["map_exact_regather_every"],
        "selection_path": r["selection_path"],
        "walk_kernel_ok": r["walk_kernel_ok"],
        "fallback_used": r["fallback_used"],
    }))


if __name__ == "__main__":
    main()
