"""Voxel-grid centroid downsampling — the TPU replacement for
pcl::VoxelGrid (SURVEY.md §2 native dep #2; used at
src/scanRegistration.cpp:576-579 and src/laserMapping.cpp:388-395,693-701,
1018-1036).

PCL's filter bins points into leaf-sized voxels and emits one centroid per
occupied voxel.  Here: pack voxel coordinates into a two-word key
(x32-friendly), lexicographically sort with a stable two-pass argsort, and
segment-mean into a fixed-capacity output — all static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 16-bit biased integer per axis: covers +-32767 voxels per axis
# (+-6.5 km at a 0.2 m leaf) split across two uint32 key words.
_BIAS = 1 << 15
_MASK16 = (1 << 16) - 1


def voxel_coords(xyz, leaf):
    """Integer voxel coordinates floor(p / leaf) with absolute origin.

    (PCL offsets by the cloud's min bound; an absolute origin is
    deterministic and batch-friendly — leaf-sized binning either way.)
    """
    return jnp.floor(xyz / leaf).astype(jnp.int32)


def pack_coords2(cij):
    """Pack (..., 3) int voxel coords into (key_hi, key_lo) uint32 words:
    key_hi = (z+B) << 16 | (y+B),  key_lo = (x+B)."""
    c = (cij + _BIAS).astype(jnp.uint32) & _MASK16
    key_hi = (c[..., 2] << 16) | c[..., 1]
    key_lo = c[..., 0]
    return key_hi, key_lo


def unpack_coords2(key_hi, key_lo):
    z = (key_hi >> 16).astype(jnp.int32) - _BIAS
    y = (key_hi & _MASK16).astype(jnp.int32) - _BIAS
    x = (key_lo & _MASK16).astype(jnp.int32) - _BIAS
    return jnp.stack([x, y, z], -1)


_INVALID_HI = jnp.uint32(0xFFFFFFFF)


def lexsort2(key_hi, key_lo):
    """Stable lexicographic argsort by (key_hi, key_lo).

    One multi-key lax.sort pass (hi primary, lo secondary, iota payload)
    — half the cost of the classic two chained stable argsorts on TPU,
    identical permutation."""
    iota = jnp.arange(key_hi.shape[0], dtype=jnp.int32)
    _, _, perm = jax.lax.sort(
        (key_hi, key_lo, iota), num_keys=2, is_stable=True
    )
    return perm


def voxel_downsample(xyz, mask, leaf, out_cap, extra=None):
    """Centroid-downsample a masked point set.

    xyz: (N, 3), mask: (N,) bool, leaf: float, out_cap: static int.
    extra: optional (N,) per-point channel, averaged per voxel (carries the
    reference's ring/relTime "intensity" channel through the filter, as
    PCL's centroid does for the intensity field).

    Returns (out_xyz (out_cap,3), out_extra (out_cap,), out_mask).
    Voxels beyond out_cap are dropped (capacity pressure).
    """
    vox = voxel_coords(xyz, leaf)
    key_hi, key_lo = pack_coords2(vox)
    key_hi = jnp.where(mask, key_hi, _INVALID_HI)
    order = lexsort2(key_hi, key_lo)
    hi_s = key_hi[order]
    lo_s = key_lo[order]
    xyz_s = xyz[order]
    valid_s = hi_s != _INVALID_HI

    # segment ids: new segment where the sorted key changes
    newseg = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1]),
        ]
    )
    newseg = newseg & valid_s
    seg = jnp.cumsum(newseg.astype(jnp.int32)) - 1
    seg = jnp.where(valid_s, jnp.minimum(seg, out_cap), out_cap)

    # Sorted-segment sums WITHOUT scatter (TPU scatters serialize —
    # segment_sum here was a top frontend cost at large batch): segments
    # are contiguous after the sort, so each segment's sum is a
    # difference of inclusive prefix sums, located per output slot with
    # a vectorized binary search (seg is nondecreasing).  Coordinates
    # are centered on their voxel corner first, so the prefix magnitude
    # is bounded by N*leaf and the cumsum-difference rounding stays
    # ~1e-7 relative — without centering, a long ring's prefix would
    # cost the centroid ~millimetres.
    corner_s = (vox[order].astype(xyz.dtype)) * jnp.asarray(leaf, xyz.dtype)
    vals = jnp.where(valid_s[:, None], xyz_s - corner_s, 0.0)
    N = xyz.shape[0]
    s_iota = jnp.arange(out_cap)
    starts = jnp.searchsorted(seg, s_iota, side="left")
    ends = jnp.searchsorted(seg, s_iota, side="right")
    cnt = (ends - starts).astype(xyz.dtype)
    out_mask = ends > starts
    st = jnp.clip(starts, 0, N - 1)
    en = jnp.clip(ends - 1, 0, N - 1)

    csum = jnp.cumsum(vals, axis=0)
    sums = csum[en] - csum[st] + vals[st]
    denom = jnp.maximum(cnt, 1.0)[:, None]
    out_xyz = jnp.where(
        out_mask[:, None], corner_s[st] + sums / denom, 0.0
    )

    if extra is not None:
        # same trick, with every element centered on ITS segment's first
        # value (within a voxel the extra channel — ring + 0.1*relTime —
        # varies by <= the intra-voxel time spread, so the prefix stays
        # tiny and trunc(rel) ring decoding is never perturbed)
        ex_s = extra[order]
        first_of_seg = ex_s[st]                       # (out_cap,)
        seg_c = jnp.clip(seg, 0, out_cap - 1)
        exv = jnp.where(valid_s, ex_s - first_of_seg[seg_c], 0.0)
        ecs = jnp.cumsum(exv)
        ex_sum = ecs[en] - ecs[st] + exv[st]
        out_extra = jnp.where(
            out_mask, first_of_seg + ex_sum / jnp.maximum(cnt, 1.0), 0.0
        )
    else:
        out_extra = jnp.zeros((out_cap,), xyz.dtype)
    return out_xyz, out_extra, out_mask
