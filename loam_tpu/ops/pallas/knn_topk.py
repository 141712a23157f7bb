"""Fused brute-force k-NN: pairwise distances + streaming top-k in one
Pallas kernel.

TPU-native replacement for the mapping kd-tree 5-NN
(src/laserMapping.cpp:717,824): distances of a (Q,) query block against
the (M,) local map are computed tile-by-tile on the MXU (the -2 q.r cross
term) and reduced into a running per-query top-k entirely in VMEM — the
(Q, M) distance matrix never exists in HBM.  HBM traffic is just
Q*3 + M*3 floats in and Q*k out, ~1000x less than materializing
candidates.

Exactness: brute force over the whole local map — a strict superset of
the reference's FLANN result (identical within the 1 m^2 gate the caller
applies), unlike cell-bucketed approximations.

Layout: coordinates are passed transposed, (3, Q) and (3, M), so the
contraction feeds the MXU without in-kernel transposes and the long axes
sit on the 128-lane dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# python literal, not a jnp scalar: kernel bodies must not capture traced
# constants
BIG = 1e30


_INT_BIG = 0x7FFFFFFF  # python literal: kernels must not capture traced constants


def _insert_sorted_keys(state_k, state_i, v, vi):
    """Insert one candidate column (packed key v (TQ,), global index vi)
    into the ascending per-row sorted int-key state (TQ, K).  Classic
    shift-insert, vectorized."""
    if state_k.shape[-1] == 1:  # k=1: plain running min
        upd = v[:, None] < state_k
        return (
            jnp.where(upd, v[:, None], state_k),
            jnp.where(upd, vi[:, None], state_i),
        )
    prev_k = jnp.concatenate(
        [jnp.full_like(state_k[:, :1], -0x80000000),
         state_k[:, :-1]],
        axis=1,
    )
    prev_i = jnp.concatenate([state_i[:, :1], state_i[:, :-1]], axis=1)
    v_ = v[:, None]
    vi_ = vi[:, None]
    lands = (state_k > v_) & (prev_k <= v_)
    shift = prev_k > v_
    new_k = jnp.where(lands, v_, jnp.where(shift, prev_k, state_k))
    new_i = jnp.where(lands, vi_, jnp.where(shift, prev_i, state_i))
    return new_k, new_i


def _knn_kernel(nl_ref, q3_ref, q2_ref, r3_ref, r2_ref, d_out, i_out,
                *, k, tm):
    """One query block vs the whole reference set, tiled over M.

    Top-k trick: clamp d2 >= 0, bitcast to int32 (monotonic for
    non-negative floats), mask the mantissa's low bits and pack the
    within-tile column there — one int-min reduce then yields value AND
    index, and the mask-out is a single equality compare.  Exact
    distances are recomputed by the caller from the returned indices, so
    the packing's ~2^-12 relative truncation only affects ordering of
    near-identical neighbors.

    nl_ref (scalar prefetch): live reference count.  Valid entries are
    compacted to the front (feature clouds via features._compact, local
    maps via map_store.local_map_points), so tiles past
    ceil(n_live / tm) hold only masked padding (r2 = BIG) and are
    skipped — the capacity M is a worst-case bound, typically 1.5-3x the
    live size, and brute-force cost scales with the LIVE size only.
    """
    TQ = q3_ref.shape[1]
    M = r3_ref.shape[1]
    q3 = q3_ref[:, :]                       # (3, TQ)
    q2 = q2_ref[0, :]                       # (TQ,)
    # >= 1 so an empty reference still yields BIG distances (not the
    # NaN-bitcast sentinel the caller's validity gate cannot see)
    n_tiles = jnp.clip((nl_ref[0] + tm - 1) // tm, 1, M // tm)

    col_bits = max((tm - 1).bit_length(), 1)
    low_mask = (1 << col_bits) - 1
    high_mask = -(1 << col_bits)

    state_k = jnp.full((TQ, k), _INT_BIG, jnp.int32)
    state_i = jnp.zeros((TQ, k), jnp.int32)

    def body(t, st):
        state_k, state_i = st
        base = t * tm
        r3 = r3_ref[:, pl.ds(base, tm)]     # (3, TM)
        r2 = r2_ref[0, pl.ds(base, tm)]     # (TM,) — BIG on invalid slots
        cross = jax.lax.dot_general(
            q3, r3, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # full f32 multiplies: the TPU default is single-pass bf16,
            # whose ~2^-8 relative error on the cross term (~|q||r|)
            # swamps centimetre-scale neighbor gaps
            precision=jax.lax.Precision.HIGHEST,
        )                                    # (TQ, TM)
        d2 = jnp.maximum(q2[:, None] - 2.0 * cross + r2[None, :], 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, (TQ, tm), 1)
        key = (
            jax.lax.bitcast_convert_type(d2, jnp.int32) & high_mask
        ) | col
        for _ in range(k):
            m = jnp.min(key, axis=1)
            gidx = base + (m & low_mask)
            state_k, state_i = _insert_sorted_keys(
                state_k, state_i, m, gidx
            )
            key = jnp.where(key == m[:, None], _INT_BIG, key)
        return state_k, state_i

    state_k, state_i = jax.lax.fori_loop(
        0, n_tiles, body, (state_k, state_i)
    )
    d_out[:, :] = jax.lax.bitcast_convert_type(
        state_k & high_mask, jnp.float32
    )
    i_out[:, :] = state_i


def _knn_kernel_dyn(ns_ref, q3_ref, q2_ref, r3_ref, r2_ref, d_out, i_out,
                    *, k, tq, tm):
    """Whole-problem variant: grid=(1,), everything VMEM-resident, BOTH
    loops dynamic — outer over ceil(n_q/tq) live query blocks, inner
    over a PER-BLOCK WINDOW of reference tiles.  Queries and references
    are front-compacted (voxel_downsample / local_map_points), so cost
    scales with live*live instead of capacity*capacity; at typical
    mapping load (~30-50% live on each axis) that is a 4-10x work cut
    the static grid cannot express.

    ns_ref (scalar prefetch):
    [n_q_live, n_ref_live, t_lo[0..NQB-1], t_hi[0..NQB-1]] with
    NQB = Q // tq.  Query block b only visits reference tiles in
    [t_lo[b], min(t_hi[b], live tiles)) — the caller computes these
    windows from per-tile coordinate intervals when the reference is
    spatially sorted (map_store.local_map_points), or passes
    [0, n_tiles] for the exhaustive scan.  Skipped tiles can only hide
    neighbors farther than the caller's search window, whose output
    rows stay BIG and fail the caller's distance gate — exact within
    the gate (the contract the reference's own 1 m^2 5-NN gate defines,
    src/laserMapping.cpp:717-719,824-826).

    Output rows for blocks past the live query count keep the BIG
    pre-fill, which the caller's d2 gate treats as invalid."""
    Q = q3_ref.shape[1]
    M = r3_ref.shape[1]
    NQB = Q // tq
    nq_tiles = jnp.clip((ns_ref[0] + tq - 1) // tq, 1, NQB)
    nm_tiles = jnp.clip((ns_ref[1] + tm - 1) // tm, 1, M // tm)

    col_bits = max((tm - 1).bit_length(), 1)
    low_mask = (1 << col_bits) - 1
    high_mask = -(1 << col_bits)

    d_out[:, :] = jnp.full((Q, k), BIG, jnp.float32)
    i_out[:, :] = jnp.zeros((Q, k), jnp.int32)

    def qblock(b, _):
        qbase = b * tq
        q3 = q3_ref[:, pl.ds(qbase, tq)]    # (3, TQ)
        q2 = q2_ref[0, pl.ds(qbase, tq)]    # (TQ,)
        state_k = jnp.full((tq, k), _INT_BIG, jnp.int32)
        state_i = jnp.zeros((tq, k), jnp.int32)

        def body(t, st):
            state_k, state_i = st
            base = t * tm
            r3 = r3_ref[:, pl.ds(base, tm)]
            r2 = r2_ref[0, pl.ds(base, tm)]
            cross = jax.lax.dot_general(
                q3, r3, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            d2 = jnp.maximum(q2[:, None] - 2.0 * cross + r2[None, :], 0.0)
            col = jax.lax.broadcasted_iota(jnp.int32, (tq, tm), 1)
            key = (
                jax.lax.bitcast_convert_type(d2, jnp.int32) & high_mask
            ) | col
            for _ in range(k):
                m = jnp.min(key, axis=1)
                gidx = base + (m & low_mask)
                state_k, state_i = _insert_sorted_keys(
                    state_k, state_i, m, gidx
                )
                key = jnp.where(key == m[:, None], _INT_BIG, key)
            return state_k, state_i

        t_lo = jnp.maximum(ns_ref[2 + b], 0)
        t_hi = jnp.minimum(ns_ref[2 + NQB + b], nm_tiles)
        state_k, state_i = jax.lax.fori_loop(
            t_lo, t_hi, body, (state_k, state_i)
        )
        d_out[pl.ds(qbase, tq), :] = jax.lax.bitcast_convert_type(
            state_k & high_mask, jnp.float32
        )
        i_out[pl.ds(qbase, tq), :] = state_i
        return 0

    jax.lax.fori_loop(0, nq_tiles, qblock, 0)


@functools.partial(jax.jit, static_argnames=("k", "tq", "tm", "interpret"))
def knn_topk_dyn(q_xyz, ref_xyz, ref_mask, n_q, n_ref, k: int = 5,
                 tq: int = 256, tm: int = 2048, interpret: bool = False,
                 t_lo=None, t_hi=None):
    """knn_topk with BOTH the query and reference axes live-count
    bounded (front-compacted inputs).  Returns (idx (Q, k), d2 (Q, k));
    rows past n_q are BIG/0 fill the caller's gate rejects.

    t_lo/t_hi: optional (Q//tq,) int32 per-query-block reference-tile
    windows (see _knn_kernel_dyn) — defaults to the exhaustive
    [0, M//tm) scan."""
    Q = q_xyz.shape[0]
    M = ref_xyz.shape[0]
    assert Q % tq == 0 and M % tm == 0, (Q, tq, M, tm)
    NQB = Q // tq

    q3 = q_xyz.T.astype(jnp.float32)
    r3 = ref_xyz.T.astype(jnp.float32)
    q2 = jnp.sum(q_xyz * q_xyz, axis=1)[None, :]
    r2 = jnp.sum(ref_xyz * ref_xyz, axis=1)
    r2 = jnp.where(ref_mask, r2, BIG)[None, :]

    if t_lo is None:
        t_lo = jnp.zeros((NQB,), jnp.int32)
    if t_hi is None:
        t_hi = jnp.full((NQB,), M // tm, jnp.int32)
    ns = jnp.concatenate([
        jnp.stack(
            [jnp.asarray(n_q, jnp.int32), jnp.asarray(n_ref, jnp.int32)]
        ),
        t_lo.astype(jnp.int32),
        t_hi.astype(jnp.int32),
    ])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((3, Q), lambda i, ns: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q), lambda i, ns: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, M), lambda i, ns: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i, ns: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, k), lambda i, ns: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, k), lambda i, ns: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    d2, idx = pl.pallas_call(
        functools.partial(_knn_kernel_dyn, k=k, tq=tq, tm=tm),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * M * 3 + Q * M * (2 + k),
            bytes_accessed=(Q * 3 + M * 3 + Q + M) * 4 + Q * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ns, q3, q2, r3, r2)
    return idx, d2


@functools.partial(jax.jit, static_argnames=("k", "tq", "tm", "interpret"))
def knn_topk(q_xyz, q_mask, ref_xyz, ref_mask, k: int = 5,
             tq: int = 256, tm: int = 2048, interpret: bool = False,
             n_ref=None):
    """Exact k nearest reference points for every query.

    q_xyz (Q, 3), ref_xyz (M, 3) with validity masks.  Q must be a
    multiple of tq and M of tm (pad with masked slots).  Returns
    (idx (Q, k) int32 nearest-first, d2 (Q, k)); masked reference slots
    never appear (their distance is ~1e30), masked queries return
    garbage rows the caller must gate.

    n_ref: optional live count when valid entries are compacted to the
    front — tiles wholly past it are skipped (cost scales with the live
    size, not the padded capacity).  Defaults to sum(ref_mask), which is
    only a valid bound for front-compacted clouds; pass M explicitly for
    scattered masks.
    """
    Q = q_xyz.shape[0]
    M = ref_xyz.shape[0]
    assert Q % tq == 0 and M % tm == 0, (Q, tq, M, tm)

    if n_ref is None:
        n_ref = jnp.sum(ref_mask.astype(jnp.int32))

    q3 = q_xyz.T.astype(jnp.float32)                      # (3, Q)
    r3 = ref_xyz.T.astype(jnp.float32)                    # (3, M)
    q2 = jnp.sum(q_xyz * q_xyz, axis=1)[None, :]          # (1, Q)
    r2 = jnp.sum(ref_xyz * ref_xyz, axis=1)
    r2 = jnp.where(ref_mask, r2, BIG)[None, :]            # (1, M)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // tq,),
        in_specs=[
            pl.BlockSpec((3, tq), lambda i, nl: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, nl: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, M), lambda i, nl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i, nl: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda i, nl: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda i, nl: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    d2, idx = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tm=tm),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * M * 3 + Q * M * (2 + k),
            bytes_accessed=(Q * 3 + M * 3 + Q + M) * 4 + Q * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([n_ref], jnp.int32), q3, q2, r3, r2)
    del q_mask  # masked queries are gated by the caller's d2 gate
    return idx, d2


def knn_topk_reference(q_xyz, q_mask, ref_xyz, ref_mask, k: int = 5,
                       chunk: int = 1024):
    """Pure-jnp reference (and CPU fallback): identical semantics."""
    r2 = jnp.sum(ref_xyz * ref_xyz, axis=1)
    r2 = jnp.where(ref_mask, r2, BIG)

    def one(args):
        q, _ = args
        cross = jax.lax.dot_general(
            q, ref_xyz, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = (
            jnp.sum(q * q, axis=1)[:, None] - 2.0 * cross + r2[None, :]
        )
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    Q = q_xyz.shape[0]
    if Q <= chunk or Q % chunk:
        return one((q_xyz, None))
    n = Q // chunk
    idx, d2 = jax.lax.map(
        one, (q_xyz.reshape(n, chunk, 3), jnp.zeros((n, chunk), bool))
    )
    return idx.reshape(Q, k), d2.reshape(Q, k)


def _tile(n, prefs):
    for t in prefs:
        if n % t == 0:
            return t
    return n


def tile_windows(qa, n_q, ra, ref_mask, tq: int, tm: int, margin: float):
    """Per-query-block reference-tile windows for the pruned kNN kernel.

    qa (Q,) / ra (M,): coordinates on the pruning axis; the REFERENCE
    must be sorted ascending on that axis over its live (front-compacted)
    prefix (map_store.local_map_points), so each tile covers a
    contiguous coordinate interval and the tiles intersecting
    [block_min - margin, block_max + margin] form one contiguous run.
    Queries need NOT be sorted for correctness — only for the windows to
    be narrow.  Returns (t_lo, t_hi) int32 (Q//tq,).
    """
    big = jnp.float32(3.0e38)
    Q = qa.shape[0]
    M = ra.shape[0]
    live_q = jnp.arange(Q) < n_q
    qb = jnp.where(live_q, qa, big).reshape(Q // tq, tq)
    qlo = jnp.min(qb, axis=1) - margin
    qhi = jnp.max(jnp.where(qb >= big, -big, qb), axis=1) + margin

    rt = jnp.where(ref_mask, ra, big).reshape(M // tm, tm)
    tmin = jnp.min(rt, axis=1)
    tmax = jnp.max(jnp.where(rt >= big, -big, rt), axis=1)
    # fully-dead tiles sit at the tail; give them (+inf, +inf) bounds so
    # they never count into t_lo yet always fall past t_hi
    tmax = jnp.where(tmax <= -big, big, tmax)

    t_lo = jnp.sum((tmax[None, :] < qlo[:, None]).astype(jnp.int32), 1)
    t_hi = M // tm - jnp.sum(
        (tmin[None, :] > qhi[:, None]).astype(jnp.int32), 1
    )
    return t_lo, t_hi


def knn_points(q_xyz, q_mask, ref_xyz, ref_mask, k: int = 5, n_q=None,
               prune_axis=None, prune_window: float | None = None):
    """Dispatch: Pallas on TPU, jnp elsewhere.  Returns (pts (Q, k, 3),
    d2 (Q, k)) nearest-first — the shape the mapping residuals consume.
    ref must be front-compacted (true for feature clouds and LocalMap).

    n_q: optional live query count when queries are ALSO front-compacted
    (voxel_downsample stacks) — switches to the whole-problem kernel
    with a dynamic query-block loop, so cost scales live*live.

    prune_axis/prune_window: spatial tile pruning (TPU dyn path only).
    prune_axis is the axis the reference is SORTED along
    (LocalMap.sort_axis); prune_window the caller's neighbor-distance
    gate in meters.  Query blocks then skip reference tiles entirely
    outside [block_min - window, block_max + window] on that axis.
    Neighbors farther than the window may be reported as BIG — callers
    MUST gate on d2 < window^2 (the mapping 1 m^2 gate does,
    src/laserMapping.cpp:717-719); results within the gate are exact."""
    # recenter on the reference cloud: the |q|^2 - 2q.r + |r|^2 form loses
    # ~eps*|q||r| to cancellation for neighbors much closer than the
    # origin distance (kilometres into a trajectory, this would dominate)
    n_live = jnp.sum(ref_mask.astype(jnp.int32))
    n_ref = jnp.maximum(n_live.astype(jnp.float32), 1.0)
    center = jnp.sum(
        jnp.where(ref_mask[:, None], ref_xyz, 0.0), axis=0
    ) / n_ref
    qc = q_xyz - center
    rc = ref_xyz - center

    if jax.default_backend() == "tpu":
        tq = _tile(q_xyz.shape[0], (256, 128, 64, 32, 16, 8))
        prune = (
            prune_axis is not None
            and prune_window is not None
            and n_q is not None
        )
        if prune:
            # smaller reference tiles: the window's resolution is one
            # tile, so pruning needs granularity more than the big-tile
            # loop needs fewer iterations (measured: profile_knn.py)
            tm = _tile(ref_xyz.shape[0], (512, 256, 128))
            qa = jnp.take(qc, prune_axis, axis=1)
            ra = jnp.take(rc, prune_axis, axis=1)
            # +1 mm absolute slack: qa/ra carry ~eps*|coord| recentering
            # rounding (<= ~1e-5 m at 100 m extents)
            t_lo, t_hi = tile_windows(
                qa, n_q, ra, ref_mask, tq, tm, float(prune_window) + 1e-3
            )
            idx, d2k = knn_topk_dyn(qc, rc, ref_mask, n_q, n_live, k,
                                    tq=tq, tm=tm, t_lo=t_lo, t_hi=t_hi)
        elif n_q is not None:
            tm = _tile(ref_xyz.shape[0], (2048, 1024, 512, 256, 128))
            idx, d2k = knn_topk_dyn(qc, rc, ref_mask, n_q, n_live, k,
                                    tq=tq, tm=tm)
        else:
            tm = _tile(ref_xyz.shape[0], (2048, 1024, 512, 256, 128))
            idx, d2k = knn_topk(qc, q_mask, rc, ref_mask, k, tq=tq,
                                tm=tm, n_ref=n_live)
        invalid = d2k > 1e28
    else:
        idx, d2k = knn_topk_reference(qc, q_mask, rc, ref_mask, k)
        invalid = d2k > 1e28
    pts = ref_xyz[jnp.clip(idx, 0, ref_xyz.shape[0] - 1)]
    # recompute exact distances for the winners and restore the
    # nearest-first order (selection used cancellation-/truncation-noisy
    # keys; the set is what matters, the k values are tiny to fix up)
    diff = q_xyz[:, None, :] - pts
    d2 = jnp.where(
        invalid, jnp.float32(BIG), jnp.sum(diff * diff, axis=-1)
    )
    order = jnp.argsort(d2, axis=1)
    d2 = jnp.take_along_axis(d2, order, axis=1)
    pts = jnp.take_along_axis(pts, order[..., None], axis=1)
    return pts, d2
