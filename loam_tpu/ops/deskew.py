"""Motion-deskew transforms of the odometry stage.

Pure vectorized re-implementations of TransformToStart / TransformToEnd
(src/laserOdometry.cpp:101-194).  The odometry's frame-to-frame motion
``transform`` = [rx,ry,rz,tx,ty,tz] maps sweep-end coordinates back to
sweep-start; each point is carried by the fraction s of the sweep elapsed
at its firing time (linear motion interpolation).
"""

from __future__ import annotations

import jax.numpy as jnp


def _rot_seq_to_start(x, y, z, rx, ry, rz):
    """Apply Ry(-ry) @ Rx(-rx) @ Rz(-rz) elementwise (the rotation
    sequence of TransformToStart, src/laserOdometry.cpp:112-122)."""
    c, s = jnp.cos(rz), jnp.sin(rz)
    x1 = c * x + s * y
    y1 = -s * x + c * y
    z1 = z
    c, s = jnp.cos(rx), jnp.sin(rx)
    x2 = x1
    y2 = c * y1 + s * z1
    z2 = -s * y1 + c * z1
    c, s = jnp.cos(ry), jnp.sin(ry)
    xo = c * x2 - s * z2
    yo = y2
    zo = s * x2 + c * z2
    return xo, yo, zo


def transform_to_start(xyz, s, transform):
    """TransformToStart (src/laserOdometry.cpp:101-124).

    xyz: (..., 3) points in the current (distorted) sweep frame.
    s:   (...)    per-point sweep fraction = 10*frac(intensity).
    transform: (6,) current motion estimate.

    p_start = Ry(-s ry) Rx(-s rx) Rz(-s rz) (p - s t)
    """
    rx = s * transform[0]
    ry = s * transform[1]
    rz = s * transform[2]
    tx = s * transform[3]
    ty = s * transform[4]
    tz = s * transform[5]
    xo, yo, zo = _rot_seq_to_start(
        xyz[..., 0] - tx, xyz[..., 1] - ty, xyz[..., 2] - tz, rx, ry, rz
    )
    return jnp.stack([xo, yo, zo], -1)


def transform_to_end(xyz, s, transform, imu_start_rpy=None, imu_last_rpy=None,
                     imu_shift_from_start=None):
    """TransformToEnd (src/laserOdometry.cpp:126-194).

    Projects a distorted-sweep point to the sweep-end frame: first to the
    sweep-start frame by the per-point fraction s, then forward through the
    full motion, then (if IMU provided) the nonlinear-motion correction:

    p_end = R_imuLast^T R_imuStart (p6 - shift),  p6 = Rz Rx Ry p_start + t

    where R_imu = Ry(yaw) Rx(pitch) Rz(roll) (src/laserOdometry.cpp:168-192).
    """
    p0 = transform_to_start(xyz, s, transform)
    x3, y3, z3 = p0[..., 0], p0[..., 1], p0[..., 2]

    rx, ry, rz = transform[0], transform[1], transform[2]
    tx, ty, tz = transform[3], transform[4], transform[5]

    # forward: Ry(ry) then Rx(rx) then Rz(rz), plus translation
    # (src/laserOdometry.cpp:156-166)
    c, s_ = jnp.cos(ry), jnp.sin(ry)
    x4 = c * x3 + s_ * z3
    y4 = y3
    z4 = -s_ * x3 + c * z3
    c, s_ = jnp.cos(rx), jnp.sin(rx)
    x5 = x4
    y5 = c * y4 - s_ * z4
    z5 = s_ * y4 + c * z4
    c, s_ = jnp.cos(rz), jnp.sin(rz)
    x6 = c * x5 - s_ * y5 + tx
    y6 = s_ * x5 + c * y5 + ty
    z6 = z5 + tz

    if imu_start_rpy is None:
        return jnp.stack([x6, y6, z6], -1)

    ps, ys, rs = imu_start_rpy[0], imu_start_rpy[1], imu_start_rpy[2]
    pl, yl, rl = imu_last_rpy[0], imu_last_rpy[1], imu_last_rpy[2]
    sx, sy, sz = (
        imu_shift_from_start[0],
        imu_shift_from_start[1],
        imu_shift_from_start[2],
    )

    # R_imuStart applied to (p6 - shift): Rz(rollStart), Rx(pitchStart),
    # Ry(yawStart)  (src/laserOdometry.cpp:168-180)
    c, s_ = jnp.cos(rs), jnp.sin(rs)
    x7 = c * (x6 - sx) - s_ * (y6 - sy)
    y7 = s_ * (x6 - sx) + c * (y6 - sy)
    z7 = z6 - sz
    c, s_ = jnp.cos(ps), jnp.sin(ps)
    x8 = x7
    y8 = c * y7 - s_ * z7
    z8 = s_ * y7 + c * z7
    c, s_ = jnp.cos(ys), jnp.sin(ys)
    x9 = c * x8 + s_ * z8
    y9 = y8
    z9 = -s_ * x8 + c * z8

    # R_imuLast^T: Ry(-yawLast), Rx(-pitchLast), Rz(-rollLast)
    # (src/laserOdometry.cpp:182-192)
    c, s_ = jnp.cos(yl), jnp.sin(yl)
    x10 = c * x9 - s_ * z9
    y10 = y9
    z10 = s_ * x9 + c * z9
    c, s_ = jnp.cos(pl), jnp.sin(pl)
    x11 = x10
    y11 = c * y10 + s_ * z10
    z11 = -s_ * y10 + c * z10
    c, s_ = jnp.cos(rl), jnp.sin(rl)
    xo = c * x11 + s_ * y11
    yo = -s_ * x11 + c * y11
    zo = z11
    return jnp.stack([xo, yo, zo], -1)
