"""Feature extraction: curvature, occlusion filters, and subregion
selection (components C1/C4 of SURVEY.md §2; src/scanRegistration.cpp).

The reference walks the concatenated cloud with per-point loops and an
O(n^2) insertion sort per subregion (src/scanRegistration.cpp:359-582).
Here every ring is a fixed-width row of a (n_scans, W) array:

* curvature — the literal 11-tap float32 accumulation chain per ring
  (src/scanRegistration.cpp:359-391), bit-matching the reference (windows
  of selectable points never cross rings, so per-ring is exact);
* occlusion / parallel-beam rejection — vectorized neighbor diffs plus
  6-wide mask dilations over the CONCATENATED compacted cloud
  (src/scanRegistration.cpp:395-452), preserving the reference's
  cross-ring boundary bleed, then gathered back into ring rows;
* per-subregion greedy pick — the sequential quota/suppression semantics
  (src/scanRegistration.cpp:460-582) as a lax.scan over the 6 subregions
  with a fori_loop over curvature-sorted candidates (full subregion by
  default; bounded via corner_scan_k/flat_scan_k), vmapped over rings,
  with the reference's exact tie order (a backwards walk of a stable
  ascending insertion sort).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..config import LoamConfig
from ..types import FeatureClouds, PointCloud, Sweep
from .voxel import voxel_downsample

NEG_INF = jnp.float32(-jnp.inf)
POS_INF = jnp.float32(jnp.inf)


def _shift(a, s, fill):
    """Shift a 1-D array right by s (s>0) or left (s<0), filling with
    `fill` — static shift, no wraparound."""
    if s == 0:
        return a
    if s > 0:
        return jnp.concatenate([jnp.full((s,), fill, a.dtype), a[:-s]])
    return jnp.concatenate([a[-s:], jnp.full((-s,), fill, a.dtype)])


def ring_curvature(xyz, n):
    """Curvature c_k for k in [5, n-6] (src/scanRegistration.cpp:359-391),
    else 0.

    Computed with the reference's literal left-to-right accumulation
    order — x[k-5] + x[k-4] + ... + x[k-1] - 10 x[k] + x[k+1] + ... —
    in float32, so the value is bit-identical to the C++ float chain.
    (A cumsum-window form is algebraically equal but rounds differently,
    and near-tie curvature order drives the chaotic greedy selection.)
    """
    W = xyz.shape[0]
    idx = jnp.arange(W)

    def sh(k):
        # sh(k)[i] = xyz[i + k]; wrap contamination only lands outside
        # the [5, n-6] validity window
        return jnp.roll(xyz, -k, axis=0)

    acc = sh(-5)
    for k in (-4, -3, -2, -1):
        acc = acc + sh(k)
    acc = acc - 10.0 * xyz
    for k in (1, 2, 3, 4, 5):
        acc = acc + sh(k)
    c = acc[:, 0] * acc[:, 0] + acc[:, 1] * acc[:, 1] \
        + acc[:, 2] * acc[:, 2]
    valid = (idx >= 5) & (idx <= n - 6)
    return jnp.where(valid, c, 0.0), valid


def ring_gaps(xyz):
    """Squared neighbor gaps ||p_{k+1} - p_k||^2 along one row (the
    suppression-walk gap tests, src/scanRegistration.cpp:495-519)."""
    W = xyz.shape[0]
    nxt = jnp.clip(jnp.arange(W) + 1, 0, W - 1)
    gap = xyz[nxt] - xyz
    return jnp.sum(gap * gap, axis=-1)


def ring_prefilter(xyz, n, cfg: LoamConfig):
    """Occlusion + parallel-beam neighbor rejection
    (src/scanRegistration.cpp:395-452).  Returns the initial
    "neighbor picked" mask for a ring row."""
    W = xyz.shape[0]
    idx = jnp.arange(W)
    nxt = jnp.clip(idx + 1, 0, W - 1)
    gap = xyz[nxt] - xyz
    gap_sq = jnp.sum(gap * gap, axis=-1)  # ||p_{k+1} - p_k||^2
    in_loop = (idx >= 5) & (idx <= n - 7)

    depth = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1))
    depth_n = depth[nxt]
    big_gap = in_loop & (gap_sq > cfg.occlusion_diff_sq)

    # current point occludes the next (depth1 > depth2): compare the next
    # point against the current scaled onto its ray.  Multiplication
    # order follows the reference literally ((x * d2) / d1,
    # src/scanRegistration.cpp:412-414) so the f32 rounding matches.
    scaled_cur = (xyz * depth_n[:, None]) / jnp.maximum(
        depth, 1e-6
    )[:, None]
    d_b = xyz[nxt] - scaled_cur
    behind = big_gap & (depth > depth_n) & (
        jnp.sqrt(jnp.sum(d_b * d_b, -1)) / jnp.maximum(depth_n, 1e-6)
        < cfg.occlusion_rel_thresh
    )
    # next point occludes the current (depth2 >= depth1)
    scaled_nxt = (xyz[nxt] * depth[:, None]) / jnp.maximum(
        depth_n, 1e-6
    )[:, None]
    d_a = scaled_nxt - xyz
    ahead = big_gap & (depth <= depth_n) & (
        jnp.sqrt(jnp.sum(d_a * d_a, -1)) / jnp.maximum(depth, 1e-6)
        < cfg.occlusion_rel_thresh
    )

    picked = jnp.zeros((W,), bool)
    # behind[k] marks k-5..k ; ahead[k] marks k+1..k+6
    for s in range(0, 6):
        picked = picked | _shift(behind, -s, False)
    for s in range(1, 7):
        picked = picked | _shift(ahead, s, False)

    # parallel-beam: both neighbor gaps large relative to range
    dis = jnp.sum(xyz * xyz, axis=-1)
    prev_gap = _shift(gap_sq, 1, 0.0)
    par = in_loop & (gap_sq > cfg.parallel_beam_frac * dis) & (
        prev_gap > cfg.parallel_beam_frac * dis
    )
    picked = picked | par
    return picked, gap_sq


def _upd(arr, i, val, pred):
    return arr.at[i].set(jnp.where(pred, val, arr[i]))


def _suppress_reach(gap_sq, gap_thr, n_sup):
    """Precompute, per index, how far the +-n_sup suppression wave of a
    pick travels before hitting a surface gap > gap_thr
    (src/scanRegistration.cpp:494-520).  gap_sq[i] is the gap between i
    and i+1.  Returns (up_reach, down_reach) int32 arrays: a pick at i
    marks (i, i + up_reach[i]] upward and [i - down_reach[i], i) downward.
    Gaps are pure cloud geometry, so one vectorized precompute replaces
    the per-pick scatter walk."""
    ok = gap_sq <= gap_thr
    up = jnp.zeros_like(gap_sq, dtype=jnp.int32)
    run = jnp.ones_like(ok)
    for l in range(n_sup):
        run = run & _shift(ok, -l, False)
        up = up + run.astype(jnp.int32)
    ok_dn = _shift(ok, 1, False)  # gap between i-1 and i
    down = jnp.zeros_like(up)
    run = jnp.ones_like(ok)
    for l in range(n_sup):
        run = run & _shift(ok_dn, l, False)
        down = down + run.astype(jnp.int32)
    return up, down


def _apply_suppression(picked, iota, ind, take, up_reach, down_reach):
    """Mark the pick and its gap-limited +-window in one vector op."""
    up = up_reach[ind]
    dn = down_reach[ind]
    m = (iota >= ind - dn) & (iota <= ind + up)
    return picked | (m & take)


def select_ring(xyz, curv, gap_sq, pre_picked, n, cfg: LoamConfig):
    """Greedy per-subregion feature labeling for one ring.

    Returns labels (W,) int8: 2 sharp, 1 less-sharp, -1 flat, 0 other;
    and the final picked mask.  Follows src/scanRegistration.cpp:460-582
    exactly (quota arithmetic, the unmarked 21st corner / 4th flat quirks,
    gap-limited +-5 suppression).
    """
    W = xyz.shape[0]
    SUBW = cfg.ring_width // cfg.n_subregions + 8
    labels0 = jnp.zeros((W,), jnp.int8)
    ok_ring = n >= 12
    iota = jnp.arange(W)
    up_reach, down_reach = _suppress_reach(
        gap_sq, cfg.suppress_gap_sq, cfg.suppress_neighbors
    )

    # subregion bounds (src/scanRegistration.cpp:463-464):
    # scanStartInd = first+5, scanEndInd = next_first-5, so the
    # ring-relative span endpoints are s = 5 and e = n-5 (the union
    # of subregions is [5, n-6] since ep_last = e-1).
    # All six subregions' candidate orders are precomputed HERE, outside
    # the sequential scan: two batched (n_sub, SUBW) argsorts instead of
    # twelve scan-serialized ones (the greedy walk itself is the only
    # inherently sequential part).
    js = jnp.arange(cfg.n_subregions)
    sp_all = (5 * (cfg.n_subregions - js) + (n - 5) * js) // cfg.n_subregions
    ep_all = (
        5 * (cfg.n_subregions - 1 - js) + (n - 5) * (js + 1)
    ) // cfg.n_subregions - 1
    idx_all = sp_all[:, None] + jnp.arange(SUBW)[None, :]
    idxc_all = jnp.clip(idx_all, 0, W - 1)
    valid_all = (idx_all <= ep_all[:, None]) & ok_ring
    c_desc_all = jnp.where(valid_all, curv[idxc_all], NEG_INF)
    # the reference's descending traversal walks a stable ASCENDING
    # insertion sort backwards (src/scanRegistration.cpp:466-477), so
    # curvature ties are visited larger-index first; emulate by
    # stable-sorting a reversed view (invalid -inf entries still land
    # last)
    rev = jnp.arange(SUBW)[::-1]
    order_desc_all = rev[
        jnp.argsort(-c_desc_all[:, rev], axis=1, stable=True)
    ]
    c_asc_all = jnp.where(valid_all, curv[idxc_all], POS_INF)
    order_asc_all = jnp.argsort(c_asc_all, axis=1)

    def subregion(carry, xs):
        labels, picked = carry
        order_desc, order_asc, idxc, valid = xs

        def corner_step(st):
            labels, picked, cnt, stopped, t = st
            sub_i = order_desc[t]
            ind = idxc[sub_i]
            qualify = (
                valid[sub_i]
                & ~picked[ind]
                & (curv[ind] > cfg.curvature_threshold)
                & ~stopped
            )
            newcnt = cnt + qualify.astype(jnp.int32)
            take = qualify & (newcnt <= cfg.max_less_sharp_per_subregion)
            stopped = stopped | (
                qualify & (newcnt > cfg.max_less_sharp_per_subregion)
            )
            # exact early exit: the walk is curvature-descending, so once
            # the current candidate fails the threshold (or is padding)
            # nothing later can qualify (src/scanRegistration.cpp:477-480)
            stopped = stopped | ~valid[sub_i] | (
                curv[ind] <= cfg.curvature_threshold
            )
            lab = jnp.where(
                newcnt <= cfg.max_sharp_per_subregion, jnp.int8(2), jnp.int8(1)
            )
            labels = _upd(labels, ind, lab, take)
            picked = _apply_suppression(
                picked, iota, ind, take, up_reach, down_reach
            )
            return labels, picked, newcnt, stopped, t + 1

        corner_k = cfg.corner_scan_k if cfg.corner_scan_k > 0 else SUBW
        labels, picked, _, _, _ = jax.lax.while_loop(
            lambda st: (st[4] < corner_k) & ~st[3],
            corner_step,
            (labels, picked, jnp.int32(0), jnp.bool_(False), jnp.int32(0)),
        )

        def flat_step(st):
            labels, picked, cnt, stopped, t = st
            sub_i = order_asc[t]
            ind = idxc[sub_i]
            qualify = (
                valid[sub_i]
                & ~picked[ind]
                & (curv[ind] < cfg.curvature_threshold)
                & ~stopped
            )
            newcnt = cnt + qualify.astype(jnp.int32)
            labels = _upd(labels, ind, jnp.int8(-1), qualify)
            stopped = stopped | (qualify & (newcnt >= cfg.max_flat_per_subregion))
            # exact early exit: curvature-ascending walk — once the
            # current candidate exceeds the threshold (or is padding)
            # nothing later can qualify (src/scanRegistration.cpp:525-528)
            stopped = stopped | ~valid[sub_i] | (
                curv[ind] >= cfg.curvature_threshold
            )
            # the reference breaks *before* marking the final flat pick
            mark = qualify & (newcnt < cfg.max_flat_per_subregion)
            picked = _apply_suppression(
                picked, iota, ind, mark, up_reach, down_reach
            )
            return labels, picked, newcnt, stopped, t + 1

        flat_k = cfg.flat_scan_k if cfg.flat_scan_k > 0 else SUBW
        labels, picked, _, _, _ = jax.lax.while_loop(
            lambda st: (st[4] < flat_k) & ~st[3],
            flat_step,
            (labels, picked, jnp.int32(0), jnp.bool_(False), jnp.int32(0)),
        )
        return (labels, picked), None

    (labels, picked), _ = jax.lax.scan(
        subregion, (labels0, pre_picked),
        (order_desc_all, order_asc_all, idxc_all, valid_all),
    )
    return labels, picked


def select_rings_argmax(curv, gap_sq, pre_picked, n, cfg: LoamConfig):
    """Batched greedy selection, iterating over PICKS instead of
    candidates — exact select_ring labeling with a FIXED trip count.

    The reference walk (src/scanRegistration.cpp:460-582) visits
    curvature-sorted candidates and skips already-suppressed ones; the
    candidate the walk takes next is always the extremal unpicked valid
    candidate, so one masked argmax per pick reproduces the visit order
    exactly:

    * ties: the descending traversal walks a stable ascending insertion
      sort backwards, visiting larger-index-first — emulated by argmax
      over a lane-reversed key; the ascending flat walk visits
      smaller-index-first — plain argmin (first occurrence);
    * the below-threshold / span-end break is automatic: curvature is
      monotone along the visit order, so when the extremal unpicked
      candidate fails the threshold no further pick can qualify;
    * the unmarked 21st-corner quirk = stopping after 20 picks (the
      overflow candidate is neither labeled nor suppressed), and the
      4th-flat quirk = suppressing only picks 1..3.

    Unlike the while_loop walk (select_ring) this costs exactly
    6 subregions x (20 corner + 4 flat) = 144 vector steps regardless of
    batch size — a batched while_loop runs every lane to the SLOWEST
    ring's visit count, which grows with B*F*rings and made frontend
    cost superlinear in batch (round-3 BENCH.md).

    curv/gap_sq (R, W) f32, pre_picked (R, W) bool, n (R,) int32.
    Returns (labels (R, W) int8, picked (R, W) bool).
    """
    R, W = curv.shape
    SUBW = cfg.ring_width // cfg.n_subregions + 8
    ok_ring = n >= 12
    iota_w = jnp.arange(W)[None, :]
    iota_r = jnp.arange(R)

    up_reach, down_reach = jax.vmap(
        lambda g: _suppress_reach(
            g, cfg.suppress_gap_sq, cfg.suppress_neighbors
        )
    )(gap_sq)

    # subregion spans (same arithmetic as select_ring)
    js = jnp.arange(cfg.n_subregions)
    sp_all = (
        5 * (cfg.n_subregions - js)[None, :] + (n[:, None] - 5) * js[None, :]
    ) // cfg.n_subregions                                    # (R, n_sub)
    ep_all = (
        5 * (cfg.n_subregions - 1 - js)[None, :]
        + (n[:, None] - 5) * (js[None, :] + 1)
    ) // cfg.n_subregions - 1
    idx_all = sp_all[..., None] + jnp.arange(SUBW)           # (R, n_sub, SUBW)
    idxc = jnp.clip(idx_all, 0, W - 1)
    valid = (idx_all <= ep_all[..., None]) & ok_ring[:, None, None]
    gather_ring = jax.vmap(lambda a, i: a[i])
    cv = gather_ring(curv, idxc.reshape(R, -1)).reshape(idxc.shape)

    labels0 = jnp.zeros((R, W), jnp.int8)

    def suppress(picked, ind, do):
        up = gather_ring(up_reach, ind[:, None])[:, 0]
        dn = gather_ring(down_reach, ind[:, None])[:, 0]
        m = (iota_w >= (ind - dn)[:, None]) & (iota_w <= (ind + up)[:, None])
        return picked | (m & do[:, None])

    def pick_step(labels, picked, idxc_j, valid_j, key, descending, lab,
                  do_suppress):
        """One pick: extremal unpicked valid candidate, label, suppress."""
        picked_g = jnp.take_along_axis(picked, idxc_j, axis=1)
        avail = valid_j & ~picked_g
        if descending:
            k = jnp.where(avail, key, NEG_INF)[:, ::-1]
            sel = (SUBW - 1) - jnp.argmax(k, axis=1)
            take = jnp.take_along_axis(
                jnp.where(avail, key, NEG_INF), sel[:, None], axis=1
            )[:, 0] > NEG_INF
        else:
            k = jnp.where(avail, key, POS_INF)
            sel = jnp.argmin(k, axis=1)
            take = jnp.take_along_axis(k, sel[:, None], axis=1)[:, 0] < POS_INF
        ind = jnp.take_along_axis(idxc_j, sel[:, None], axis=1)[:, 0]
        labels = labels.at[iota_r, ind].set(
            jnp.where(take, lab, labels[iota_r, ind])
        )
        picked = suppress(picked, ind, take & do_suppress)
        return labels, picked

    def subregion(carry, xs):
        labels, picked = carry
        idxc_j, valid_j, cv_j = xs

        corner_key = cv_j
        corner_valid = valid_j & (cv_j > cfg.curvature_threshold)

        def corner_pick(k, c):
            labels, picked = c
            lab = jnp.where(
                k < cfg.max_sharp_per_subregion, jnp.int8(2), jnp.int8(1)
            )
            return pick_step(
                labels, picked, idxc_j, corner_valid, corner_key,
                True, lab, jnp.array(True),
            )

        labels, picked = jax.lax.fori_loop(
            0, cfg.max_less_sharp_per_subregion, corner_pick,
            (labels, picked),
        )

        flat_valid = valid_j & (cv_j < cfg.curvature_threshold)

        def flat_pick(k, c):
            labels, picked = c
            # the reference breaks BEFORE suppressing the final flat pick
            return pick_step(
                labels, picked, idxc_j, flat_valid, cv_j,
                False, jnp.int8(-1),
                k < cfg.max_flat_per_subregion - 1,
            )

        labels, picked = jax.lax.fori_loop(
            0, cfg.max_flat_per_subregion, flat_pick, (labels, picked)
        )
        return (labels, picked), None

    (labels, picked), _ = jax.lax.scan(
        subregion, (labels0, pre_picked),
        (
            jnp.moveaxis(idxc, 1, 0),
            jnp.moveaxis(valid, 1, 0),
            jnp.moveaxis(cv, 1, 0),
        ),
    )
    return labels, picked


@functools.lru_cache(maxsize=None)
def _walk_kernel_probe(n_sub, subw, W, max_sharp, max_less_sharp,
                       max_flat):
    """One-time (per shape set, per process) TPU compile probe of the
    selection-walk kernel, INCLUDING a double-vmap level — the exact
    transform bench.py applies (vmap over scenarios AND frames).  If
    Mosaic rejects the lowering for any reason, extract_features
    degrades to the XLA select_ring path instead of crashing the caller
    (round-3 postmortem: a kernel that compiled single-vmap failed at
    the production double-vmap shape and killed the benchmark).

    Returns (ok, error_string) — the error is recorded, not swallowed,
    so a Mosaic regression is visible in bench output
    (bench.py selection_path field) instead of manifesting only as an
    unexplained perf delta."""
    from .pallas import select_walk as SW

    try:
        def one(cm, fm, p0):
            return SW.select_walk(
                cm, fm, p0, n_sub=n_sub, subw=subw, W=W,
                max_sharp=max_sharp, max_less_sharp=max_less_sharp,
                max_flat=max_flat,
            )

        K = n_sub * subw
        cm = jax.ShapeDtypeStruct((2, 2, 16, K), jnp.int32)
        p0 = jax.ShapeDtypeStruct((2, 2, 16, W // 32), jnp.uint32)
        jax.jit(jax.vmap(jax.vmap(one))).lower(cm, cm, p0).compile()
        return True, ""
    except Exception as e:  # record the failure for selection_report
        return False, f"{type(e).__name__}: {e}"


def _walk_kernel_ok(n_sub, subw, W, max_sharp, max_less_sharp,
                    max_flat) -> bool:
    return _walk_kernel_probe(
        n_sub, subw, W, max_sharp, max_less_sharp, max_flat
    )[0]


def selection_report(cfg: LoamConfig) -> dict:
    """Which greedy-selection formulation extract_features will run for
    this config on the current backend, plus the kernel-probe outcome.
    Mirrors the dispatch in extract_features exactly; consumed by
    bench.py so driver artifacts record the actual path taken."""
    rep = {"walk_kernel_ok": None, "walk_kernel_error": ""}
    if cfg.select_argmax:
        rep["selection_path"] = "argmax"
        return rep
    if cfg.select_walk_kernel and jax.default_backend() == "tpu":
        ok, err = _walk_kernel_probe(
            cfg.n_subregions,
            cfg.ring_width // cfg.n_subregions + 8,
            cfg.ring_width,
            cfg.max_sharp_per_subregion,
            cfg.max_less_sharp_per_subregion,
            cfg.max_flat_per_subregion,
        )
        rep["walk_kernel_ok"] = ok
        rep["walk_kernel_error"] = err
        rep["selection_path"] = (
            "pallas_walk_kernel" if ok else "xla_walk"
        )
        return rep
    rep["selection_path"] = "xla_walk"
    return rep


def select_rings_walk(curv, gap_sq, pre_picked, n, cfg: LoamConfig,
                      interpret: bool = False):
    """Batched (R rings) greedy selection via the Pallas walk kernel
    (ops/pallas/select_walk.py) — exact same labeling as
    vmap(select_ring), but the sequential walk runs on the TPU scalar
    core over SMEM bit-fields instead of XLA while_loops over (W,) rows,
    with true per-ring early exit.

    curv/gap_sq (R, W) f32, pre_picked (R, W) bool, n (R,) int32.
    Returns (labels (R, W) int8, picked (R, W) bool).
    """
    from .pallas import select_walk as SW

    R, W = curv.shape
    SUBW = cfg.ring_width // cfg.n_subregions + 8
    ok_ring = n >= 12

    up_reach, down_reach = jax.vmap(
        lambda g: _suppress_reach(
            g, cfg.suppress_gap_sq, cfg.suppress_neighbors
        )
    )(gap_sq)

    js = jnp.arange(cfg.n_subregions)
    sp_all = (
        5 * (cfg.n_subregions - js)[None, :] + (n[:, None] - 5) * js[None, :]
    ) // cfg.n_subregions                                    # (R, n_sub)
    ep_all = (
        5 * (cfg.n_subregions - 1 - js)[None, :]
        + (n[:, None] - 5) * (js[None, :] + 1)
    ) // cfg.n_subregions - 1
    idx_all = sp_all[..., None] + jnp.arange(SUBW)           # (R, n_sub, SUBW)
    idxc = jnp.clip(idx_all, 0, W - 1)
    valid = (idx_all <= ep_all[..., None]) & ok_ring[:, None, None]

    gather_ring = jax.vmap(lambda a, i: a[i])
    cv = gather_ring(curv, idxc.reshape(R, -1)).reshape(idxc.shape)

    def walk_order(c_fill, descending):
        if descending:
            # stable ASCENDING insertion sort walked backwards
            # (src/scanRegistration.cpp:466-477): ties visit
            # larger-index first
            rev = jnp.arange(SUBW)[::-1]
            return rev[jnp.argsort(
                -c_fill[..., rev], axis=-1, stable=True
            )]
        return jnp.argsort(c_fill, axis=-1)

    def meta_for(order, qual):
        g = lambda a: jnp.take_along_axis(a, order, axis=-1)
        ind = g(idxc)
        up = gather_ring(up_reach, ind.reshape(R, -1)).reshape(ind.shape)
        dn = gather_ring(down_reach, ind.reshape(R, -1)).reshape(ind.shape)
        # clip reaches at the ring bounds — identical to the XLA path's
        # iota-range mask, and keeps the kernel's word indices in range
        up = jnp.minimum(up, (W - 1) - ind)
        dn = jnp.minimum(dn, ind)
        return SW.pack_walk_meta(ind, g(valid), g(qual), up, dn).reshape(
            R, cfg.n_subregions * SUBW
        )

    c_desc = jnp.where(valid, cv, NEG_INF)
    corner_meta = meta_for(
        walk_order(c_desc, True), cv > cfg.curvature_threshold
    )
    c_asc = jnp.where(valid, cv, POS_INF)
    flat_meta = meta_for(
        walk_order(c_asc, False), cv < cfg.curvature_threshold
    )

    s_bits, l_bits, f_bits, p_bits = SW.select_walk(
        corner_meta, flat_meta, SW.pack_bits(pre_picked),
        n_sub=cfg.n_subregions, subw=SUBW, W=W,
        max_sharp=cfg.max_sharp_per_subregion,
        max_less_sharp=cfg.max_less_sharp_per_subregion,
        max_flat=cfg.max_flat_per_subregion,
        interpret=interpret,
    )
    sharp = SW.unpack_bits(s_bits, W)
    less = SW.unpack_bits(l_bits, W)
    flat = SW.unpack_bits(f_bits, W)
    labels = jnp.where(
        sharp, jnp.int8(2),
        jnp.where(less, jnp.int8(1), jnp.where(flat, jnp.int8(-1),
                                               jnp.int8(0))),
    )
    return labels, SW.unpack_bits(p_bits, W)


def _compact(xyz, rel, mask, cap):
    """Stable compaction of masked points into a fixed-capacity cloud
    (ring-major order preserved) — one stable lax.sort keyed on ~mask
    with the point columns as payload (see ops/compact.py for why this
    beats both the scatter and binary-search forms on TPU)."""
    from .compact import compact_masked

    (x, y, z, r), ok = compact_masked(
        mask, (xyz[:, 0], xyz[:, 1], xyz[:, 2], rel), cap
    )
    return PointCloud(
        xyz=jnp.where(ok[:, None], jnp.stack([x, y, z], -1), 0.0),
        rel=jnp.where(ok, r, 0.0),
        mask=ok,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_features(sweep: Sweep, cfg: LoamConfig = LoamConfig()) -> FeatureClouds:
    """Full feature extraction over one ring-organized sweep.

    Equivalent of laserCloudHandler's feature block
    (src/scanRegistration.cpp:358-582); IMU deskew happens upstream in the
    registration frontend (loam_tpu/frontend.py).
    """
    counts = jnp.sum(sweep.mask.astype(jnp.int32), axis=1)

    curv, _ = jax.vmap(ring_curvature)(sweep.xyz, counts)

    # occlusion/parallel-beam prefilter over the CONCATENATED cloud, as
    # the reference walks it (src/scanRegistration.cpp:395-452): marks
    # bleed across ring boundaries into the first/last selectable index
    # of the neighboring ring, which seeds the chaotic greedy selection.
    # Compact valid points ring-major (the reference's concatenation
    # order), run the 1-D prefilter globally, and gather marks back into
    # ring rows.
    from .compact import compact_masked

    n_scans, W = sweep.mask.shape
    flat_mask0 = sweep.mask.reshape(-1)
    flat_xyz0 = sweep.xyz.reshape(-1, 3)
    (cx, cy, cz), ok0 = compact_masked(
        flat_mask0,
        (flat_xyz0[:, 0], flat_xyz0[:, 1], flat_xyz0[:, 2]),
        n_scans * W,
    )
    xyz_c = jnp.where(ok0[:, None], jnp.stack([cx, cy, cz], -1), 0.0)
    n_total = jnp.sum(flat_mask0.astype(jnp.int32))
    picked_c, _ = ring_prefilter(xyz_c, n_total, cfg)
    ring_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    gather_idx = ring_starts[:, None] + jnp.arange(W)[None, :]
    pre_picked = picked_c[
        jnp.clip(gather_idx, 0, n_scans * W - 1)
    ] & sweep.mask

    # per-ring neighbor gaps for the suppression walks (within-ring by
    # construction for all selectable picks)
    gap_sq = jax.vmap(ring_gaps)(sweep.xyz)

    if cfg.select_argmax:
        # the argmax formulation iterates over PICKS, not candidates, so
        # the walk-truncation knobs have no analogue — refuse the silent
        # semantics change instead of ignoring them
        assert cfg.corner_scan_k == 0 and cfg.flat_scan_k == 0, (
            "select_argmax=True is incompatible with "
            "corner_scan_k/flat_scan_k truncation (walk-only knobs)"
        )
        labels, _ = select_rings_argmax(
            curv, gap_sq, pre_picked, counts, cfg
        )
    elif (
        cfg.select_walk_kernel
        and jax.default_backend() == "tpu"
        and _walk_kernel_ok(
            cfg.n_subregions,
            cfg.ring_width // cfg.n_subregions + 8,
            cfg.ring_width,
            cfg.max_sharp_per_subregion,
            cfg.max_less_sharp_per_subregion,
            cfg.max_flat_per_subregion,
        )
    ):
        labels, _ = select_rings_walk(
            curv, gap_sq, pre_picked, counts, cfg
        )
    else:
        labels, _ = jax.vmap(
            lambda x, c, g, p, n: select_ring(x, c, g, p, n, cfg)
        )(sweep.xyz, curv, gap_sq, pre_picked, counts)

    idx = jnp.arange(cfg.ring_width)[None, :]
    selectable = (idx >= 5) & (idx <= (counts[:, None] - 6)) & sweep.mask

    flat_xyz = sweep.xyz.reshape(-1, 3)
    flat_rel = sweep.rel.reshape(-1)
    lab = labels.reshape(-1)

    sharp = _compact(
        flat_xyz, flat_rel, (lab == 2).reshape(-1), cfg.max_sharp
    )
    less_sharp = _compact(
        flat_xyz, flat_rel, (lab >= 1).reshape(-1), cfg.max_less_sharp
    )
    flat = _compact(
        flat_xyz, flat_rel, (lab == -1).reshape(-1), cfg.max_flat
    )

    # less-flat: everything selectable with label <= 0, voxel-downsampled
    # 0.2 m per ring (src/scanRegistration.cpp:568-581)
    lf_mask = selectable & (labels <= 0)

    def ring_downsample(x, r, m):
        return voxel_downsample(
            x, m, cfg.less_flat_leaf, cfg.less_flat_ring_cap, extra=r
        )

    lf_xyz, lf_rel, lf_m = jax.vmap(ring_downsample)(
        sweep.xyz, sweep.rel, lf_mask
    )
    less_flat = _compact(
        lf_xyz.reshape(-1, 3),
        lf_rel.reshape(-1),
        lf_m.reshape(-1),
        cfg.max_less_flat,
    )

    full = sweep.flatten()
    return FeatureClouds(
        sharp=sharp, less_sharp=less_sharp, flat=flat, less_flat=less_flat,
        full=full,
    )
