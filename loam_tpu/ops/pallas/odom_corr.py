"""Fused odometry correspondence search: 1-NN + break-bounded directional
ring scans in two Pallas passes.

The reference finds, per sharp/flat feature, the kd-tree 1-NN in the
previous cloud plus a 2nd (and for surfaces a 3rd) point by walking the
ring-sorted cloud outward from the 1-NN, breaking past +-2.5 ring ids
(src/laserOdometry.cpp:474-651).  The jnp implementation materializes
(Q, M) distance/eligibility masks in HBM every re-association — the hot
cost of the odometry GN loop.  Here the walk semantics map exactly onto
an index-ordered streaming reduction:

* pass A: 1-NN (packed-key streaming min, as in knn_topk);
* pass B: per M-tile, maintain per-query running bests for the
  "upward" (col > j1) and "downward" (col < j1) sides; an upward break
  element (ring > cr + window) freezes the upward side for all later
  tiles; a downward break element (ring < cr - window) resets the
  downward side — discarding earlier candidates, exactly like the
  reference's backward walk stopping there.

Invalid reference slots carry ring = +1e6, so the first padding slot acts
as an upward break — the walk "runs off the end of the cloud" just like
the reference's loop bound.  The truncation quirk (upward col bound at
the query count, src/laserOdometry.cpp:486,598) is a scalar-prefetch
argument.

Selection uses mantissa-truncated packed keys (see knn_topk); the caller
recomputes exact distances for the winners and applies the reference's
strict 25 m^2 gates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
_INT_BIG = 0x7FFFFFFF


def _tile_key(d2, col_bits):
    bits = jax.lax.bitcast_convert_type(jnp.maximum(d2, 0.0), jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    return (bits & -(1 << col_bits)) | col


def _merge(best_d, best_i, key, base, col_bits):
    """Merge a tile's masked packed keys into the running (d_bits, idx).

    An all-ineligible tile yields min(key) == _INT_BIG, whose
    mantissa-truncated high bits would compare BELOW the initial best_d
    sentinel and smuggle in a garbage index; real packed keys can never
    equal _INT_BIG (distances are <= ~1e30), so gate on it explicitly.
    """
    m = jnp.min(key, axis=1)
    d = m & -(1 << col_bits)
    i = base + (m & ((1 << col_bits) - 1))
    upd = (m != jnp.int32(_INT_BIG)) & (d < best_d)
    return jnp.where(upd, d, best_d), jnp.where(upd, i, best_i)


def _corr_kernel(nq_ref, q3_ref, q2_ref, r3_ref, r2_ref, ring_ref, cr_ref,
                 j1_ref, o2_ref, o3_ref, *, surf, tm, window, truncate):
    TQ = q3_ref.shape[1]
    M = r3_ref.shape[1]
    col_bits = max((tm - 1).bit_length(), 1)
    q3 = q3_ref[:, :]
    q2 = q2_ref[0, :]
    cr = cr_ref[0, :]                        # (TQ,) float ring of the 1-NN
    j1 = j1_ref[0, :]                        # (TQ,) int32 1-NN index
    n_q = nq_ref[0]
    # live reference count: the last cloud is front-compacted, so tiles
    # wholly past it are all padding (ring 1e6 = upward break, r2 = BIG)
    # and contribute nothing — skip them
    n_tiles = jnp.clip((nq_ref[1] + tm - 1) // tm, 1, M // tm)

    int_big = jnp.int32(_INT_BIG)
    state = dict(
        b2_d=jnp.full((TQ,), int_big, jnp.int32),
        b2_i=jnp.full((TQ,), -1, jnp.int32),
        b2d_d=jnp.full((TQ,), int_big, jnp.int32),
        b2d_i=jnp.full((TQ,), -1, jnp.int32),
        # int32, not bool: Mosaic cannot reshape 1-D i1 vectors
        up_done=jnp.zeros((TQ,), jnp.int32),
    )
    if surf:
        state.update(
            b3_d=jnp.full((TQ,), int_big, jnp.int32),
            b3_i=jnp.full((TQ,), -1, jnp.int32),
            b3d_d=jnp.full((TQ,), int_big, jnp.int32),
            b3d_i=jnp.full((TQ,), -1, jnp.int32),
        )

    def body(t, st):
        base = t * tm
        r3 = r3_ref[:, pl.ds(base, tm)]
        r2 = r2_ref[0, pl.ds(base, tm)]
        rg = ring_ref[0, pl.ds(base, tm)]    # (TM,) float; 1e6 on padding
        cross = jax.lax.dot_general(
            q3, r3, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = q2[:, None] - 2.0 * cross + r2[None, :]
        key0 = _tile_key(d2, col_bits)

        gcol = base + jax.lax.broadcasted_iota(jnp.int32, (TQ, tm), 1)
        up_side = gcol > j1[:, None]
        dn_side = gcol < j1[:, None]
        rg_b = rg[None, :]
        crq = cr[:, None]

        # upward break: first col > j1 with ring > cr + window
        # (int min/max reductions only — Mosaic has no bool argmax)
        up_brk = up_side & (rg_b > crq + window)
        up_brk_pos = jnp.min(
            jnp.where(up_brk, gcol, jnp.int32(0x7FFFFFF0)), axis=1
        )
        up_ok = (
            up_side
            & (st["up_done"][:, None] == 0)
            & (gcol < up_brk_pos[:, None])
        )
        if truncate:
            up_ok &= gcol < n_q

        # downward break: last col < j1 with ring < cr - window
        dn_brk = dn_side & (rg_b < crq - window)
        dn_brk_pos = jnp.max(jnp.where(dn_brk, gcol, -1), axis=1)
        has_dn_brk = dn_brk_pos >= 0
        dn_ok = dn_side & (gcol > dn_brk_pos[:, None])

        def pick(el_mask):
            return jnp.where(el_mask, key0, int_big)

        new = dict(st)
        # 2nd point: corner wants a DIFFERENT ring; surf the SAME-side
        # eligibility of the reference (<= cr upward, >= cr downward)
        if surf:
            el2_up = up_ok & (rg_b <= crq)
            el2_dn = dn_ok & (rg_b >= crq)
            el3_up = up_ok & (rg_b > crq)
            el3_dn = dn_ok & (rg_b < crq)
            new["b3_d"], new["b3_i"] = _merge(
                st["b3_d"], st["b3_i"], pick(el3_up), base, col_bits
            )
            b3d_d = jnp.where(has_dn_brk, int_big, st["b3d_d"])
            b3d_i = jnp.where(has_dn_brk, -1, st["b3d_i"])
            new["b3d_d"], new["b3d_i"] = _merge(
                b3d_d, b3d_i, pick(el3_dn), base, col_bits
            )
        else:
            el2_up = up_ok & (rg_b > crq)
            el2_dn = dn_ok & (rg_b < crq)

        new["b2_d"], new["b2_i"] = _merge(
            st["b2_d"], st["b2_i"], pick(el2_up), base, col_bits
        )
        b2d_d = jnp.where(has_dn_brk, int_big, st["b2d_d"])
        b2d_i = jnp.where(has_dn_brk, -1, st["b2d_i"])
        new["b2d_d"], new["b2d_i"] = _merge(
            b2d_d, b2d_i, pick(el2_dn), base, col_bits
        )
        new["up_done"] = jnp.maximum(
            st["up_done"],
            (up_brk_pos < jnp.int32(0x7FFFFFF0)).astype(jnp.int32),
        )
        return new

    st = jax.lax.fori_loop(0, n_tiles, body, state)

    # the upward walk runs first in the reference, so it wins ties
    up_better2 = st["b2_d"] <= st["b2d_d"]
    o2_ref[0, :] = jnp.where(up_better2, st["b2_i"], st["b2d_i"])
    if surf:
        up_better3 = st["b3_d"] <= st["b3d_d"]
        o3_ref[0, :] = jnp.where(up_better3, st["b3_i"], st["b3d_i"])
    else:
        o3_ref[0, :] = jnp.full((TQ,), -1, jnp.int32)


@functools.partial(jax.jit, static_argnames=("surf", "window", "truncate",
                                              "tq", "tm", "interpret"))
def _corr_pallas(q_xyz, cr, j1, ref_xyz, r2m, ring_m, n_q, n_ref, *, surf,
                 window, truncate, tq, tm, interpret=False):
    Q = q_xyz.shape[0]
    M = ref_xyz.shape[0]
    q3 = q_xyz.T.astype(jnp.float32)
    r3 = ref_xyz.T.astype(jnp.float32)
    q2 = jnp.sum(q_xyz * q_xyz, axis=1)[None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // tq,),
        in_specs=[
            pl.BlockSpec((3, tq), lambda i, nq: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, nq: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, M), lambda i, nq: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i, nq: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i, nq: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, nq: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, nq: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq), lambda i, nq: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, nq: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    o2, o3 = pl.pallas_call(
        functools.partial(
            _corr_kernel, surf=surf, tm=tm, window=window,
            truncate=truncate,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, Q), jnp.int32),
            jax.ShapeDtypeStruct((1, Q), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.stack([jnp.asarray(n_q, jnp.int32),
                   jnp.asarray(n_ref, jnp.int32)]),
        q3, q2, r3, r2m[None, :], ring_m[None, :],
        cr[None, :], j1[None, :],
    )
    return o2[0], o3[0]


def odom_correspondences(proj, q_mask, ref_xyz, ref_mask, ref_ring, n_q,
                         gate_sq: float, window: float, truncate: bool,
                         surf: bool, interpret: bool = False):
    """TPU path for the odometry correspondence search.  Returns
    (j1, j2[, j3]) with the reference's strict gates applied; -1 where no
    candidate qualifies."""
    from .knn_topk import knn_topk, _tile

    Q = proj.shape[0]
    M = ref_xyz.shape[0]
    tq = _tile(Q, (256, 128, 64, 32, 16, 8))
    tm = _tile(M, (2048, 1024, 512, 256, 128))

    # recenter for cancellation (distances invariant)
    n_live = jnp.sum(ref_mask.astype(jnp.int32))
    center = jnp.sum(
        jnp.where(ref_mask[:, None], ref_xyz, 0.0), axis=0
    ) / jnp.maximum(n_live.astype(jnp.float32), 1.0)
    qc = proj - center
    rc = ref_xyz - center

    idx1, _ = knn_topk(qc, None, rc, ref_mask, 1, tq=tq, tm=tm,
                       interpret=interpret, n_ref=n_live)
    j1_raw = idx1[:, 0]

    def exact_d2(j):
        p = ref_xyz[jnp.clip(j, 0, M - 1)]
        d = proj - p
        return jnp.sum(d * d, axis=1)

    j1 = jnp.where(
        q_mask & (exact_d2(j1_raw) < gate_sq) & ref_mask[
            jnp.clip(j1_raw, 0, M - 1)
        ],
        j1_raw, -1,
    )

    ring_m = jnp.where(ref_mask, ref_ring.astype(jnp.float32), 1e6)
    r2 = jnp.sum(rc * rc, axis=1)
    r2m = jnp.where(ref_mask, r2, jnp.float32(BIG))
    cr = jnp.where(
        j1 >= 0, ring_m[jnp.clip(j1, 0, M - 1)], jnp.float32(-1e6)
    )

    j2_raw, j3_raw = _corr_pallas(
        qc, cr, jnp.clip(j1, 0, M - 1), rc, r2m, ring_m, n_q, n_live,
        surf=surf, window=window, truncate=truncate, tq=tq, tm=tm,
        interpret=interpret,
    )
    ok1 = j1 >= 0

    def valid(j):
        # defense in depth: never accept a padding/masked reference slot
        return (j >= 0) & ref_mask[jnp.clip(j, 0, M - 1)]

    j2 = jnp.where(
        ok1 & valid(j2_raw) & (exact_d2(j2_raw) < gate_sq), j2_raw, -1
    )
    if not surf:
        return j1, j2
    j3 = jnp.where(
        ok1 & valid(j3_raw) & (exact_d2(j3_raw) < gate_sq), j3_raw, -1
    )
    return j1, j2, j3
