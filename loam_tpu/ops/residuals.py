"""Point-to-line / point-to-plane residuals and Gauss-Newton Jacobians.

Components C7/C8/C14/C15 of SURVEY.md §2.  The residual geometry is the
closed-form distance + unit direction of the reference
(src/laserOdometry.cpp:530-694, src/laserMapping.cpp:714-877); the
Jacobian rows come from jax.grad of the same scalar the reference
differentiates analytically — tests/test_odometry.py pins them to literal
transcriptions of the reference's expressions (including the reference's
fixed s = 1 in the odometry Jacobian, src/laserOdometry.cpp:712).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .deskew import transform_to_start
from ..utils import rotations

_EPS = jnp.float32(1e-12)


def point_to_line(p, p1, p2):
    """Distance and unit direction from p to the line (p1, p2)
    (src/laserOdometry.cpp:534-562).  All (..., 3).

    Returns (la_lb_lc (...,3), ld2 (...)): the derivative direction of the
    distance and the distance itself.
    """
    d01 = p - p1
    d02 = p - p2
    d12 = p1 - p2
    cx = d01[..., 0] * d02[..., 1] - d02[..., 0] * d01[..., 1]
    cy = d01[..., 0] * d02[..., 2] - d02[..., 0] * d01[..., 2]
    cz = d01[..., 1] * d02[..., 2] - d02[..., 1] * d01[..., 2]
    a012 = jnp.sqrt(jnp.maximum(cx * cx + cy * cy + cz * cz, _EPS))
    l12 = jnp.sqrt(jnp.maximum(jnp.sum(d12 * d12, -1), _EPS))

    la = (d12[..., 1] * cx + d12[..., 2] * cy) / a012 / l12
    lb = -(d12[..., 0] * cx - d12[..., 2] * cz) / a012 / l12
    lc = -(d12[..., 0] * cy + d12[..., 1] * cz) / a012 / l12
    ld2 = a012 / l12
    return jnp.stack([la, lb, lc], -1), ld2


def plane_from_tripod(p1, p2, p3):
    """Unit plane normal + offset through three points
    (src/laserOdometry.cpp:658-670)."""
    u = p2 - p1
    v = p3 - p1
    pa = u[..., 1] * v[..., 2] - v[..., 1] * u[..., 2]
    pb = u[..., 2] * v[..., 0] - v[..., 2] * u[..., 0]
    pc = u[..., 0] * v[..., 1] - v[..., 0] * u[..., 1]
    n = jnp.stack([pa, pb, pc], -1)
    ps = jnp.sqrt(jnp.maximum(jnp.sum(n * n, -1, keepdims=True), _EPS))
    n = n / ps
    pd = -jnp.sum(n * p1, -1)
    return n, pd


def point_to_plane(p, normal, pd):
    """Signed distance to a unit plane (src/laserOdometry.cpp:672)."""
    return jnp.sum(normal * p, -1) + pd


def odom_jacobian_rows(points, coeffs, transform):
    """Odometry Jacobian rows d(coeff . T_start(p; theta))/d theta with the
    reference's fixed interpolation factor s = 1
    (src/laserOdometry.cpp:708-762).  points/coeffs (N, 3); returns (N, 6).
    """

    def g(theta, p, c):
        return jnp.dot(c, transform_to_start(p, jnp.float32(1.0), theta))

    grad = jax.grad(g)
    return jax.vmap(lambda p, c: grad(transform, p, c))(points, coeffs)


def odom_point_jacobians(points, transform):
    """Full per-point Jacobians J_n = dT_start(p_n; theta, s=1)/dtheta,
    shape (N, 3, 6).

    Used by the row-accumulation mode (src/laserOdometry.cpp:458-459,470):
    a row pushed at iteration t with frozen coeff c_t contributes
    r = J(theta_now)^T c_t at every later solve, so
    JtJ = sum_n J_n^T (sum_t c_t c_t^T) J_n and
    Jtb = sum_n J_n^T (sum_t c_t b_t) — the per-point outer-product
    accumulators replace a 25x row buffer.
    """

    def T(theta, p):
        return transform_to_start(p, jnp.float32(1.0), theta)

    return jax.vmap(lambda p: jax.jacfwd(T)(transform, p))(points)


def normal_equations_accumulated(J, C, b):
    """Normal equations from per-point accumulators.

    J (N, 3, 6) current-transform point Jacobians; C (N, 3, 3) accumulated
    coeff outer products; b (N, 3) accumulated coeff * rhs.  Returns
    (ata (6,6), atb (6,)).  The N-axis contraction is MXU work and psums
    over the mesh under parallel.context.row_sharding.
    """
    from ..parallel.context import constrain_axis0

    J = constrain_axis0(J)
    C = constrain_axis0(C)
    b = constrain_axis0(b)
    CJ = jnp.einsum("nab,nbj->naj", C, J)
    ata = jnp.einsum("nai,naj->ij", J, CJ)
    atb = jnp.einsum("nai,na->i", J, b)
    return ata, atb


def map_jacobian_rows(points, coeffs, transform):
    """Mapping Jacobian rows d(coeff . (R(theta) p + t))/d theta
    (src/laserMapping.cpp:897-919): translation block is the coeff itself.
    """

    def g(theta, p, c):
        return jnp.dot(c, rotations.apply_pose(theta, p))

    grad = jax.grad(g)
    return jax.vmap(lambda p, c: grad(transform, p, c))(points, coeffs)


def normal_equations(rows, rhs, keep):
    """Masked JtJ / Jtb accumulation (src/laserOdometry.cpp:765-767).

    rows (N, 6), rhs (N,), keep (N,) bool.  The masked matmuls run on the
    MXU; under parallel.context.row_sharding the row axis is sharded over
    the mesh and GSPMD turns the JtJ/Jtb contraction into a psum over ICI.
    """
    from ..parallel.context import constrain_rows

    rows = constrain_rows(rows)
    w = keep.astype(rows.dtype)
    rows_m = rows * w[:, None]
    ata = rows_m.T @ rows_m
    atb = rows_m.T @ (rhs * w)
    return ata, atb
