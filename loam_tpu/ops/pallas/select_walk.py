"""Fused greedy feature-selection walk as a Pallas TPU kernel.

The reference's per-subregion corner/flat selection
(src/scanRegistration.cpp:460-582) is an inherently sequential greedy
walk: each pick suppresses its gap-limited +-5 neighborhood, which can
disqualify later candidates, and per-subregion quotas stop the walk.
The XLA formulation (ops/features.py:select_ring) expresses each step as
a masked update of full (W,) rows inside lax.while_loop — correct, but
on TPU every while iteration costs fixed loop overhead that dwarfs the
few-lane useful work, and a batched while runs to the SLOWEST ring's
step count (~17 ms/frame at B=8: >70 us per effective step).

Here the walk runs on the TPU scalar core instead:

* Everything data-independent is precomputed OUTSIDE the kernel with
  one vectorized pass + two batched argsorts (features.py packs it):
  per candidate, in walk order, an int32 word carrying the ring index,
  gap-limited suppression reaches, span validity, and the
  above/below-threshold flag.
* In-kernel state is two bit-fields over the ring (picked, labels) held
  in SMEM words.  One walk step is ~20 scalar ops: unpack the meta
  word, test the picked bit, update quota, OR a <=11-bit suppression
  mask into at most two words.  lax.while_loop gives every ring its own
  early exit (the batched XLA while pays the max over rings).
* Grid = one program per ring; outputs are the packed label/pick
  bit-fields (4 words-rows), expanded back to (W,) labels by the
  caller with vector ops.

Layout of a meta word (see pack_walk_meta):
  bits 0-10  candidate's clipped ring index (W <= 2048)
  bits 11-13 upward suppression reach (0-5)
  bits 14-16 downward suppression reach (0-5)
  bit  17    candidate lies in the subregion span (and ring has >= 12 pts)
  bit  18    curvature qualifies (above threshold for the corner walk,
             below for the flat walk)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IND_BITS = 11
_IND_MASK = (1 << _IND_BITS) - 1
_UP_SHIFT = 11
_DN_SHIFT = 14
_VALID_SHIFT = 17
_QUAL_SHIFT = 18

# python literal (kernel bodies must not capture materialized arrays)
_ONES_INT = 0xFFFFFFFF


def pack_walk_meta(idxc, valid, qual, up_reach, down_reach):
    """Pack per-candidate walk metadata (already in walk order).

    idxc (..., SUBW) int32 ring indices, valid/qual (..., SUBW) bool,
    up_reach/down_reach (W,)-gathered reaches at idxc (..., SUBW) int32.
    Returns (..., SUBW) int32.
    """
    return (
        idxc
        | (up_reach << _UP_SHIFT)
        | (down_reach << _DN_SHIFT)
        | (valid.astype(jnp.int32) << _VALID_SHIFT)
        | (qual.astype(jnp.int32) << _QUAL_SHIFT)
    )


def _bits_below(k):
    """uint32 with bits [0, k) set, k a scalar in [0, 32]."""
    kk = jnp.minimum(k, 31).astype(jnp.uint32)
    v = (jnp.uint32(1) << kk) - jnp.uint32(1)
    return jnp.where(k >= 32, jnp.uint32(_ONES_INT), v)


def _walk_kernel(corner_ref, flat_ref, picked0_ref, out_ref, picked_s,
                 *, n_sub, subw, wb, max_sharp, max_less_sharp, max_flat):
    """One ring's full 6-subregion corner+flat walk.

    corner_ref/flat_ref: (1, 1, n_sub*subw) int32 SMEM meta in walk
    order.  picked0_ref: (1, 1, wb) uint32 SMEM — pre-picked bit-field.
    out_ref: (1, 1, 4*wb) uint32 SMEM — [sharp|less|flat|picked] words.
    picked_s: (wb,) uint32 SMEM scratch — live picked bit-field.
    (The refs carry a leading grid-blocked ring axis plus a singleton
    axis so the SMEM block's last two dims equal the array dims — the
    Mosaic lowering rule a (1, K) block over an (R, K) array violates.)
    """
    for w in range(wb):
        picked_s[w] = picked0_ref[0, 0, w]
        out_ref[0, 0, 0 * wb + w] = jnp.uint32(0)
        out_ref[0, 0, 1 * wb + w] = jnp.uint32(0)
        out_ref[0, 0, 2 * wb + w] = jnp.uint32(0)

    def unpack(meta):
        ind = meta & _IND_MASK
        up = (meta >> _UP_SHIFT) & 7
        dn = (meta >> _DN_SHIFT) & 7
        valid = ((meta >> _VALID_SHIFT) & 1) == 1
        qual = ((meta >> _QUAL_SHIFT) & 1) == 1
        return ind, up, dn, valid, qual

    def picked_bit(ind):
        return ((picked_s[ind >> 5] >> (ind & 31).astype(jnp.uint32))
                & jnp.uint32(1)) == jnp.uint32(1)

    def suppress(ind, up, dn, do):
        """OR the [ind-dn, ind+up] bit range into picked_s (<= 2 words),
        predicated on `do` (reaches never cross the ring bounds by
        construction of features._suppress_reach)."""
        lo = ind - dn
        hi = ind + up
        w0 = lo >> 5
        w1 = hi >> 5
        hi0 = jnp.minimum(hi, (w0 << 5) + 31)
        mask0 = _bits_below(hi0 - (w0 << 5) + 1) & ~_bits_below(lo - (w0 << 5))
        mask1 = jnp.where(
            w1 > w0, _bits_below(hi - (w1 << 5) + 1), jnp.uint32(0)
        )
        gate = jnp.where(do, jnp.uint32(_ONES_INT), jnp.uint32(0))
        w1c = jnp.minimum(w1, wb - 1)
        picked_s[w0] = picked_s[w0] | (mask0 & gate)
        picked_s[w1c] = picked_s[w1c] | (mask1 & gate)

    def set_label(row, ind, do):
        w = ind >> 5
        bit = jnp.where(
            do,
            jnp.uint32(1) << (ind & 31).astype(jnp.uint32),
            jnp.uint32(0),
        )
        out_ref[0, 0, row * wb + w] = out_ref[0, 0, row * wb + w] | bit

    for j in range(n_sub):
        base = j * subw

        # ---- corner walk (curvature-descending) -----------------------
        def corner_body(st):
            t, cnt, stop = st
            ind, up, dn, valid, qual = unpack(corner_ref[0, 0, base + t])
            qualify = valid & qual & ~picked_bit(ind)
            newcnt = cnt + qualify.astype(jnp.int32)
            take = qualify & (newcnt <= max_less_sharp)
            set_label(0, ind, take & (newcnt <= max_sharp))
            set_label(1, ind, take & (newcnt > max_sharp))
            suppress(ind, up, dn, take)
            # stop applies from the NEXT step (the reference breaks after
            # processing: quota overflow, below-threshold, span end)
            stop = (
                (qualify & (newcnt > max_less_sharp)) | ~valid | ~qual
            )
            return t + 1, newcnt, stop

        jax.lax.while_loop(
            lambda st: (st[0] < subw) & ~st[2],
            corner_body,
            (jnp.int32(0), jnp.int32(0), jnp.bool_(False)),
        )

        # ---- flat walk (curvature-ascending) --------------------------
        def flat_body(st):
            t, cnt, stop = st
            ind, up, dn, valid, qual = unpack(flat_ref[0, 0, base + t])
            qualify = valid & qual & ~picked_bit(ind)
            newcnt = cnt + qualify.astype(jnp.int32)
            # the reference labels the pick, then breaks BEFORE its
            # suppression when the quota is reached
            set_label(2, ind, qualify)
            suppress(ind, up, dn, qualify & (newcnt < max_flat))
            stop = (
                (qualify & (newcnt >= max_flat)) | ~valid | ~qual
            )
            return t + 1, newcnt, stop

        jax.lax.while_loop(
            lambda st: (st[0] < subw) & ~st[2],
            flat_body,
            (jnp.int32(0), jnp.int32(0), jnp.bool_(False)),
        )

    for w in range(wb):
        out_ref[0, 0, 3 * wb + w] = picked_s[w]


@functools.lru_cache(maxsize=None)
def _walk_call(n_sub, subw, wb, max_sharp, max_less_sharp, max_flat,
               interpret):
    """custom_vmap-wrapped pallas_call for the given static params.

    The walk is per-ring independent (grid = one program per ring), so
    ANY leading batch axis is just more rings: the vmap rule collapses
    the batch axis into the grid axis and recurses, which makes the
    kernel lower identically under vmap(vmap(...)) — the round-3 bench
    crash was exactly this shape (bench.py batches over scenarios AND
    frames; Mosaic rejects a 4-D operand against 2-D SMEM block specs).
    """

    def base(corner_meta, flat_meta, picked0_bits):
        R = corner_meta.shape[0]
        # ring axis leads, then a singleton, so every SMEM block's last
        # two dims EQUAL the array's last two dims — the only layout the
        # Mosaic lowering accepts for a (1, ..., K) block when K is not
        # a multiple of 128
        out = pl.pallas_call(
            functools.partial(
                _walk_kernel, n_sub=n_sub, subw=subw, wb=wb,
                max_sharp=max_sharp, max_less_sharp=max_less_sharp,
                max_flat=max_flat,
            ),
            grid=(R,),
            in_specs=[
                pl.BlockSpec((1, 1, n_sub * subw), lambda r: (r, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, n_sub * subw), lambda r: (r, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, wb), lambda r: (r, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 4 * wb), lambda r: (r, 0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((R, 1, 4 * wb), jnp.uint32),
            scratch_shapes=[pltpu.SMEM((wb,), jnp.uint32)],
            interpret=interpret,
        )(
            corner_meta[:, None, :],
            flat_meta[:, None, :],
            picked0_bits[:, None, :],
        )
        return out[:, 0, :]

    fn = jax.custom_batching.custom_vmap(base)

    @fn.def_vmap
    def _rule(axis_size, in_batched, cm, fm, p0):
        def bc(x, b):
            return x if b else jax.lax.broadcast(x, (axis_size,))

        cm = bc(cm, in_batched[0])
        fm = bc(fm, in_batched[1])
        p0 = bc(p0, in_batched[2])
        lead = cm.shape[:-1]
        out = fn(
            cm.reshape(-1, cm.shape[-1]),
            fm.reshape(-1, fm.shape[-1]),
            p0.reshape(-1, p0.shape[-1]),
        )
        return out.reshape(lead + (out.shape[-1],)), True

    return fn


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_sub", "subw", "W", "max_sharp", "max_less_sharp", "max_flat",
        "interpret",
    ),
)
def select_walk(corner_meta, flat_meta, picked0_bits, *, n_sub, subw,
                W, max_sharp, max_less_sharp, max_flat,
                interpret: bool = False):
    """Run the greedy walks for R rings.

    corner_meta/flat_meta: (R, n_sub*subw) int32 (pack_walk_meta, walk
    order).  picked0_bits: (R, W//32) uint32 pre-picked bit-field.
    Returns (sharp, less, flat, picked) bit-fields, each (R, W//32).
    Batch-safe: under vmap (any depth) the batch axes collapse into the
    ring grid axis (see _walk_call).
    """
    assert W % 32 == 0, W
    wb = W // 32
    out = _walk_call(
        n_sub, subw, wb, max_sharp, max_less_sharp, max_flat, interpret
    )(corner_meta, flat_meta, picked0_bits)
    return out[:, :wb], out[:, wb:2 * wb], out[:, 2 * wb:3 * wb], \
        out[:, 3 * wb:]


def pack_bits(mask):
    """(..., W) bool -> (..., W//32) uint32 bit-field (bit b of word w =
    index w*32+b)."""
    W = mask.shape[-1]
    assert W % 32 == 0
    m = mask.reshape(mask.shape[:-1] + (W // 32, 32))
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(
        m.astype(jnp.uint32) * weights, axis=-1, dtype=jnp.uint32
    )


def unpack_bits(words, W):
    """(..., W//32) uint32 -> (..., W) bool."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(words.shape[:-1] + (W,)).astype(bool)
