"""Masked brute-force nearest-neighbor search on the MXU.

TPU replacement for the per-frame pcl::KdTreeFLANN rebuild + 1-NN queries
of the odometry (SURVEY.md §2 native dep #1; src/laserOdometry.cpp:78-79,
478,590,905-906).  The clouds involved are small (<= 8k reference points,
<= 512 queries), so an exact masked distance matrix — one 3-dim
matmul + reductions — beats any tree: no build step, no pointer chasing,
and it batches across scenarios for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = jnp.float32(1e30)


def pairwise_sq_dists(q_xyz, r_xyz, r_mask):
    """(Q, R) squared distances; masked reference slots -> BIG.

    Computed as |q|^2 - 2 q.r + |r|^2 — the cross term is a (Q,3)x(3,R)
    matmul that XLA places on the MXU.
    """
    q2 = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)
    r2 = jnp.sum(r_xyz * r_xyz, axis=-1)
    # full f32 multiplies: the TPU matmul default is bf16, whose ~2^-8
    # relative error on the cross term swamps centimetre neighbor gaps
    cross = jax.lax.dot_general(
        q_xyz, r_xyz, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = q2 - 2.0 * cross + r2[None, :]
    return jnp.where(r_mask[None, :], jnp.maximum(d2, 0.0), BIG)


def masked_argmin(d2, cand_mask, gate_sq):
    """Argmin over candidates; returns (idx, found) with idx = -1 when no
    candidate beats the gate."""
    d2m = jnp.where(cand_mask, d2, BIG)
    idx = jnp.argmin(d2m, axis=-1)
    dmin = jnp.take_along_axis(d2m, idx[..., None], axis=-1)[..., 0]
    found = dmin < gate_sq
    return jnp.where(found, idx, -1), dmin


def nearest_1(q_xyz, q_mask, r_xyz, r_mask, gate_sq):
    """Gated 1-NN (the kdtree->nearestKSearch(1) + sqDis gate pattern,
    src/laserOdometry.cpp:478-481).  Returns (idx (Q,), d2 (Q, R))."""
    d2 = pairwise_sq_dists(q_xyz, r_xyz, r_mask)
    idx, _ = masked_argmin(d2, r_mask[None, :] & q_mask[:, None], gate_sq)
    return idx, d2
