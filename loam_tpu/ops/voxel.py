"""Voxel-grid centroid downsampling — the TPU replacement for
pcl::VoxelGrid (SURVEY.md §2 native dep #2; used at
src/scanRegistration.cpp:576-579 and src/laserMapping.cpp:388-395,693-701,
1018-1036).

PCL's filter bins points into leaf-sized voxels and emits one centroid per
occupied voxel.  Here: pack voxel coordinates into a two-word key
(x32-friendly), group with ONE stable multi-key payload lax.sort, and
segment-mean via corner-centered prefix-sum differences gathered at the
segment boundaries (two tiny sort-compactions) — all static shapes,
no scatter (see ops/compact.py for the measured rationale).
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


def voxel_downsample(xyz, mask, leaf, out_cap, extra=None):
    """Centroid-downsample a masked point set.

    xyz: (N, 3), mask: (N,) bool, leaf: float, out_cap: static int.
    extra: optional (N,) per-point channel, averaged per voxel (carries the
    reference's ring/relTime "intensity" channel through the filter, as
    PCL's centroid does for the intensity field).

    Returns (out_xyz (out_cap,3), out_extra (out_cap,), out_mask).
    Voxels beyond out_cap are dropped (capacity pressure).
    """
    from .compact import compact_masked

    N = xyz.shape[0]
    vox = voxel_coords(xyz, leaf)
    key_hi, key_lo = pack_coords2(vox)
    key_hi = jnp.where(mask, key_hi, _INVALID_HI)
    ex_in = extra if extra is not None else jnp.zeros((N,), xyz.dtype)
    # ONE multi-key payload sort groups each voxel's points contiguously
    # (replaces argsort + per-column gathers)
    hi_s, lo_s, xs, ys, zs, ex_s = jax.lax.sort(
        (key_hi, key_lo, xyz[:, 0], xyz[:, 1], xyz[:, 2], ex_in),
        num_keys=2, is_stable=True,
    )
    valid_s = hi_s != _INVALID_HI
    diff = (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
    newseg = jnp.concatenate([jnp.ones((1,), bool), diff]) & valid_s
    is_end = jnp.concatenate([diff, jnp.ones((1,), bool)]) & valid_s

    # per-segment start/end POSITIONS via two tiny sort-compactions
    # (segment j's boundaries land at slot j because boundaries appear
    # in segment order); everything else is gathered at those positions.
    # No scatter, no binary search — see ops/compact.py.
    pos = jnp.arange(N, dtype=jnp.int32)
    (p0,), ok = compact_masked(newseg, (pos,), out_cap)
    (p1,), _ = compact_masked(is_end, (pos,), out_cap)
    p0 = jnp.clip(p0, 0, N - 1)
    p1 = jnp.clip(p1, 0, N - 1)
    cnt = jnp.where(ok, (p1 - p0 + 1).astype(xyz.dtype), 0.0)
    denom = jnp.maximum(cnt, 1.0)

    # centroid sums as inclusive-prefix differences, centered on the
    # voxel corner so the prefix magnitude is bounded by N*leaf and the
    # cumsum-difference rounding stays ~1e-7 relative (uncentered, a
    # long ring's prefix would cost the centroid ~millimetres)
    corner = unpack_coords2(hi_s, lo_s).astype(xyz.dtype) * jnp.asarray(
        leaf, xyz.dtype
    )
    sxyz = jnp.stack([xs, ys, zs], -1)
    vals = jnp.where(valid_s[:, None], sxyz - corner, 0.0)
    csum = jnp.cumsum(vals, axis=0)
    sums = csum[p1] - csum[p0] + vals[p0]
    out_xyz = jnp.where(
        ok[:, None], corner[p0] + sums / denom[:, None], 0.0
    )

    if extra is not None:
        # same trick, with every element centered on ITS segment's first
        # value (within a voxel the extra channel — ring + 0.1*relTime —
        # varies by <= the intra-voxel spread, so the prefix stays tiny
        # and trunc(rel) ring decoding is never perturbed)
        seg = jnp.cumsum(newseg.astype(jnp.int32)) - 1
        first_of_seg = ex_s[p0]                        # (out_cap,)
        exv = jnp.where(
            valid_s,
            ex_s - first_of_seg[jnp.clip(seg, 0, out_cap - 1)],
            0.0,
        )
        ecs = jnp.cumsum(exv)
        ex_sum = ecs[p1] - ecs[p0] + exv[p0]
        out_extra = jnp.where(ok, first_of_seg + ex_sum / denom, 0.0)
    else:
        out_extra = jnp.zeros((out_cap,), xyz.dtype)
    return out_xyz, out_extra, jnp.where(ok, cnt > 0, False)
