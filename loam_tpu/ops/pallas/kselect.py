"""Fused k-nearest selection Pallas kernel.

Replaces the (distance -> lax.top_k -> take_along_axis) chain of the map
k-NN (loam_tpu/map_store.py knn_candidates / knn_from_candidates) with a
single VMEM-resident pass: squared distances are computed on the VPU and
the k smallest are extracted by iterative masked argmin, accumulating the
selected coordinates via one-hot reduction — no (Q, C) distance tensor or
(Q, C, 3) re-gather ever reaches HBM.

The candidate clouds here are the 27-cell neighborhoods of the voxel-hash
search grid (the kd-tree replacement for src/laserMapping.cpp:707-719 in
/root/reference); C ~ 864 candidates, k = 5..24.  lax.top_k sorts all C
per query (~2.4 ms at 8k x 864); k passes of masked argmin are ~6 VPU ops
per element (~0.5 ms) and fuse the selection gather for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # plain float: jnp scalars become captured consts inside kernels


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kselect_kernel(cx_ref, cy_ref, cz_ref, valid_ref, q_ref,
                    px_ref, py_ref, pz_ref, d2_ref, k: int):
    """One (TQ, C) tile: per-row k-smallest by iterative masked argmin."""
    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    dx = cx_ref[:] - qx
    dy = cy_ref[:] - qy
    dz = cz_ref[:] - qz
    d2 = dx * dx + dy * dy + dz * dz
    d2 = jnp.where(valid_ref[:] != 0, d2, _BIG)

    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, px_ref.shape, 1)  # (TQ, k)
    zero_k = jnp.zeros(px_ref.shape, jnp.float32)

    def pass_body(j, carry):
        d2c, px, py, pz, dd = carry
        m = jnp.min(d2c, axis=1, keepdims=True)           # (TQ, 1)
        amin = jnp.argmin(d2c, axis=1)                     # (TQ,)
        onehot = (col == amin[:, None]).astype(jnp.float32)
        sx = jnp.sum(onehot * cx_ref[:], axis=1, keepdims=True)
        sy = jnp.sum(onehot * cy_ref[:], axis=1, keepdims=True)
        sz = jnp.sum(onehot * cz_ref[:], axis=1, keepdims=True)
        # place this pass's selection into column j (dynamic-column
        # stores are unsupported; select into the carry instead)
        at_j = kcol == j
        px = jnp.where(at_j, sx, px)
        py = jnp.where(at_j, sy, py)
        pz = jnp.where(at_j, sz, pz)
        dd = jnp.where(at_j, m, dd)
        return jnp.where(onehot != 0.0, _BIG, d2c), px, py, pz, dd

    _, px, py, pz, dd = jax.lax.fori_loop(
        0, k, pass_body, (d2, zero_k, zero_k, zero_k, zero_k)
    )
    px_ref[:] = px
    py_ref[:] = py
    pz_ref[:] = pz
    d2_ref[:] = dd


@functools.partial(jax.jit, static_argnames=("k", "tile_q", "interpret"))
def knn_select(cand_xyz, valid, q_xyz, k: int, tile_q: int = 256,
               interpret: bool = False):
    """k-NN of each query within its candidate set, fused on-TPU.

    cand_xyz (Q, C, 3) float32, valid (Q, C) bool, q_xyz (Q, 3).
    Returns (pts (Q, k, 3), d2 (Q, k)) nearest-first; invalid slots have
    d2 >= 1e30 (and coordinates from the one-hot of a BIG entry).
    Bit-compatible with map_store.knn_from_candidates up to argmin
    tie-breaking (both take the lowest index).
    """
    Q, C = valid.shape
    Cp = _round_up(C, 128)
    Qp = _round_up(Q, tile_q)

    cx = jnp.zeros((Qp, Cp), jnp.float32)
    cx = cx.at[:Q, :C].set(cand_xyz[..., 0])
    cy = jnp.zeros((Qp, Cp), jnp.float32)
    cy = cy.at[:Q, :C].set(cand_xyz[..., 1])
    cz = jnp.zeros((Qp, Cp), jnp.float32)
    cz = cz.at[:Q, :C].set(cand_xyz[..., 2])
    vd = jnp.zeros((Qp, Cp), jnp.int8)
    vd = vd.at[:Q, :C].set(valid.astype(jnp.int8))
    qp = jnp.zeros((Qp, 3), jnp.float32).at[:Q].set(q_xyz)

    grid = (Qp // tile_q,)
    row_spec = pl.BlockSpec(
        (tile_q, Cp), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (tile_q, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (tile_q, k), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    px, py, pz, d2 = pl.pallas_call(
        functools.partial(_kselect_kernel, k=k),
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, row_spec, q_spec],
        out_specs=[out_spec, out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, k), jnp.float32),
            jax.ShapeDtypeStruct((Qp, k), jnp.float32),
            jax.ShapeDtypeStruct((Qp, k), jnp.float32),
            jax.ShapeDtypeStruct((Qp, k), jnp.float32),
        ],
        interpret=interpret,
    )(cx, cy, cz, vd, qp)
    pts = jnp.stack([px[:Q], py[:Q], pz[:Q]], axis=-1)
    return pts, d2[:Q]


def knn_select_reference(cand_xyz, valid, q_xyz, k: int):
    """jnp reference implementation (the pre-kernel path) for parity
    tests and CPU fallback."""
    diff = cand_xyz - q_xyz[:, None, :]
    d2 = jnp.sum(diff * diff, -1)
    d2 = jnp.where(valid, d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, k)
    pts = jnp.take_along_axis(cand_xyz, idx[:, :, None], axis=1)
    return pts, -neg
