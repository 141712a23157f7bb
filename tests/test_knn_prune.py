"""Spatial tile pruning of the exact mapping kNN
(ops/pallas/knn_topk.tile_windows + the windowed _knn_kernel_dyn).

Contract: pruning is EXACT WITHIN THE GATE — for any query whose true
k-th neighbor distance passes the caller's gate (the reference's 1 m^2
5-NN gate, src/laserMapping.cpp:717-719,824-826), the pruned kernel
returns the identical neighbor set; queries the gate rejects may get
BIG-filled rows, which the gate rejects identically.  The windows must
also be genuinely narrow (the perf point of the whole exercise).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from loam_tpu.ops.pallas.knn_topk import (
    knn_topk_dyn,
    tile_windows,
)

K = 5
GATE = 1.0  # meters, the mapping 5-NN gate radius


def _mk(rng, n_ref, n_q, M, Q, axis=0, spread=30.0):
    """Random front-compacted clouds; reference sorted on `axis`."""
    ref = rng.uniform(-spread, spread, (n_ref, 3)).astype(np.float32)
    ref = ref[np.argsort(ref[:, axis], kind="stable")]
    refp = np.zeros((M, 3), np.float32)
    refp[:n_ref] = ref
    rmask = np.zeros(M, bool)
    rmask[:n_ref] = True
    # queries clustered near reference points so many pass the gate
    base = ref[rng.integers(0, n_ref, n_q)]
    q = base + rng.normal(0, 0.3, (n_q, 3)).astype(np.float32)
    # query-block compactness: sort queries on the same axis (what
    # mapping._sort_stack_axis produces)
    q = q[np.argsort(q[:, axis], kind="stable")].astype(np.float32)
    qp = np.zeros((Q, 3), np.float32)
    qp[:n_q] = q
    return qp, refp, rmask


def _true_knn(q, ref, rmask, k):
    d2 = ((q[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    d2[:, ~rmask] = np.inf
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)


def test_windows_cover_gate_neighbors():
    """Every reference tile holding a point within GATE of a live query
    must fall inside that query block's [t_lo, t_hi) window."""
    rng = np.random.default_rng(0)
    Q, M, tq, tm = 512, 2048, 128, 256
    for trial in range(5):
        n_ref = int(rng.integers(300, 2048))
        n_q = int(rng.integers(100, 512))
        qp, refp, rmask = _mk(rng, n_ref, n_q, M, Q)
        t_lo, t_hi = jax.jit(tile_windows, static_argnums=(4, 5))(
            jnp.asarray(qp[:, 0]), n_q, jnp.asarray(refp[:, 0]),
            jnp.asarray(rmask), tq, tm, GATE + 1e-3,
        )
        t_lo = np.asarray(t_lo)
        t_hi = np.asarray(t_hi)
        for b in range(Q // tq):
            lo = b * tq
            live = np.arange(lo, lo + tq) < n_q
            if not live.any():
                continue
            qs = qp[lo:lo + tq][live]
            d2 = ((qs[:, None, :] - refp[None, :, :]) ** 2).sum(-1)
            d2[:, ~rmask] = np.inf
            near = (d2 <= GATE * GATE).any(0)  # (M,) within-gate refs
            tiles = np.unique(np.nonzero(near)[0] // tm)
            for t in tiles:
                assert t_lo[b] <= t < t_hi[b], (trial, b, t, t_lo[b],
                                                t_hi[b])


def test_windows_are_narrow():
    """The windows must prune: with ~60 m of reference extent and 128
    sorted queries per block, the average visited fraction of live tiles
    must be well below 1 (this is the perf claim, enforced)."""
    rng = np.random.default_rng(1)
    Q, M, tq, tm = 1024, 4096, 128, 256
    n_ref, n_q = 4000, 1000
    qp, refp, rmask = _mk(rng, n_ref, n_q, M, Q, spread=40.0)
    t_lo, t_hi = tile_windows(
        jnp.asarray(qp[:, 0]), n_q, jnp.asarray(refp[:, 0]),
        jnp.asarray(rmask), tq, tm, GATE + 1e-3,
    )
    nqb_live = (n_q + tq - 1) // tq
    visited = np.maximum(
        np.asarray(t_hi)[:nqb_live] - np.asarray(t_lo)[:nqb_live], 0
    )
    live_tiles = (n_ref + tm - 1) // tm
    frac = visited.mean() / live_tiles
    assert frac < 0.55, f"windows visit {frac:.2f} of live tiles"


def test_pruned_kernel_gate_equivalent():
    """Interpret-mode kernel: pruned vs exhaustive results must agree on
    every gated query; pruned-away queries must fail the gate in BOTH."""
    rng = np.random.default_rng(2)
    Q, M, tq, tm = 512, 1024, 128, 128
    for trial in range(4):
        axis = trial % 3
        n_ref = int(rng.integers(200, 1024))
        n_q = int(rng.integers(64, 512))
        qp, refp, rmask = _mk(rng, n_ref, n_q, M, Q, axis=axis)
        qj = jnp.asarray(qp)
        rj = jnp.asarray(refp)
        mj = jnp.asarray(rmask)

        idx_full, d2_full = knn_topk_dyn(
            qj, rj, mj, n_q, n_ref, K, tq=tq, tm=tm, interpret=True
        )
        t_lo, t_hi = tile_windows(
            qj[:, axis], n_q, rj[:, axis], mj, tq, tm, GATE + 1e-3
        )
        idx_pr, d2_pr = knn_topk_dyn(
            qj, rj, mj, n_q, n_ref, K, tq=tq, tm=tm, interpret=True,
            t_lo=t_lo, t_hi=t_hi,
        )
        idx_full = np.asarray(idx_full)[:n_q]
        idx_pr = np.asarray(idx_pr)[:n_q]
        d2_full = np.asarray(d2_full)[:n_q]
        d2_pr = np.asarray(d2_pr)[:n_q]

        # ground-truth gate decisions from exact numpy distances
        t_idx, t_d2 = _true_knn(qp[:n_q], refp, rmask, K)
        gated = t_d2[:, K - 1] < GATE * GATE

        # gated queries: identical neighbor sets from both kernels
        assert (idx_pr[gated] == idx_full[gated]).all()
        np.testing.assert_allclose(
            d2_pr[gated], d2_full[gated], rtol=0, atol=0
        )
        # ungated queries must fail the gate under BOTH kernels (the
        # kernel's packed keys truncate mantissas, so compare against
        # the gate, not exact distances)
        assert (d2_pr[:, K - 1][~gated] >= GATE * GATE * 0.99).all()
        assert (d2_full[:, K - 1][~gated] >= GATE * GATE * 0.99).all()
        # and gated queries' kernel distances match numpy within the
        # packing truncation (~2^-12 relative)
        np.testing.assert_allclose(
            d2_pr[gated], t_d2[gated], rtol=3e-3, atol=1e-5
        )


def test_mapping_hybrid_matches_strict_on_cpu():
    """The hybrid exact-kNN cadence (map_exact_regather_every=5:
    fused-kernel candidate gather per round + per-iteration re-rank)
    must land on the same refined poses as the strict per-iteration
    re-query on clean data — per-iteration updates are millimetric, so
    the round cache stays a superset of the gated 5-NN."""
    from loam_tpu.config import LoamConfig
    from loam_tpu.io import synth
    from loam_tpu import frontend, mapping, odometry
    from loam_tpu.ops.features import extract_features

    strict = dataclasses.replace(
        LoamConfig(),
        ring_width=1024,
        corner_table_size=1 << 14,
        surf_table_size=1 << 15,
        max_corner_from_map=8192,
        max_surf_from_map=16384,
        map_exact_knn=True,
        map_exact_regather_every=1,
    )
    hybrid = dataclasses.replace(strict, map_exact_regather_every=5)

    world = synth.make_world(seed=6)
    F = 4
    poses = synth.straight_trajectory(F + 1, speed=0.8, yaw_rate=0.1)
    poses = np.vstack([poses[:1], poses])[: F + 2]
    ostate = odometry.OdomState.create(strict)
    ms = {"strict": mapping.MapState.create(strict),
          "hybrid": mapping.MapState.create(hybrid)}
    n_mapped = 0
    for k in range(F + 1):
        xyz, m = synth.simulate_sweep(
            world, poses[k], poses[k + 1], n_azimuth=600, seed=6 + k
        )
        sweep = frontend.ingest_sweep(
            jnp.asarray(xyz), jnp.asarray(m), strict
        )
        feats = extract_features(sweep, strict)
        ostate, out = odometry.odometry_step(ostate, feats, None, strict)
        if bool(out.publish_to_mapping):
            ms["strict"], mo_s = mapping.mapping_step(
                ms["strict"], out.pose, out.corner_last, out.surf_last,
                None, strict,
            )
            ms["hybrid"], mo_h = mapping.mapping_step(
                ms["hybrid"], out.pose, out.corner_last, out.surf_last,
                None, hybrid,
            )
            np.testing.assert_allclose(
                np.asarray(mo_h.pose_aft), np.asarray(mo_s.pose_aft),
                rtol=0, atol=5e-3,
            )
            n_mapped += 1
    assert n_mapped >= 2


def test_mapping_prune_config_invariant_on_cpu():
    """cfg.map_knn_prune only reorders GN rows on the CPU backend (the
    reference knn path ignores the windows): the refined pose must agree
    with the unpruned config to float-reassociation tolerance, proving
    the stack sort + sort_axis plumbing changes no semantics."""
    from loam_tpu.config import LoamConfig
    from loam_tpu.io import synth
    from loam_tpu import frontend, mapping, odometry
    from loam_tpu.ops.features import extract_features

    cfg_on = dataclasses.replace(
        LoamConfig(),
        ring_width=1024,
        corner_table_size=1 << 14,
        surf_table_size=1 << 15,
        max_corner_from_map=8192,
        max_surf_from_map=16384,
        map_exact_knn=True,
        map_knn_prune=True,
    )
    cfg_off = dataclasses.replace(cfg_on, map_knn_prune=False)

    world = synth.make_world(seed=5)
    F = 4
    poses = synth.straight_trajectory(F + 1, speed=0.8, yaw_rate=0.1)
    poses = np.vstack([poses[:1], poses])[: F + 2]
    ostate = odometry.OdomState.create(cfg_on)
    mstates = {"on": mapping.MapState.create(cfg_on),
               "off": mapping.MapState.create(cfg_off)}
    for k in range(F + 1):
        xyz, m = synth.simulate_sweep(
            world, poses[k], poses[k + 1], n_azimuth=600, seed=5 + k
        )
        sweep = frontend.ingest_sweep(
            jnp.asarray(xyz), jnp.asarray(m), cfg_on
        )
        feats = extract_features(sweep, cfg_on)
        ostate, out = odometry.odometry_step(ostate, feats, None, cfg_on)
        if bool(out.publish_to_mapping):
            mstates["on"], mo_on = mapping.mapping_step(
                mstates["on"], out.pose, out.corner_last, out.surf_last,
                None, cfg_on,
            )
            mstates["off"], mo_off = mapping.mapping_step(
                mstates["off"], out.pose, out.corner_last, out.surf_last,
                None, cfg_off,
            )
            np.testing.assert_allclose(
                np.asarray(mo_on.pose_aft), np.asarray(mo_off.pose_aft),
                rtol=0, atol=2e-3,
            )
