"""Rotation / pose algebra in the reference's exact YXZ-Euler convention.

The reference composes every rotation from hand-unrolled Euler expressions
(e.g. /root/reference/src/laserOdometry.cpp:196-273,
src/laserMapping.cpp:110-197).  Numerically those expressions are closed
forms of products of the three elementary rotations with

    R(rx, ry, rz) = Ry(ry) @ Rx(rx) @ Rz(rz)

(derived from pointAssociateToMap, src/laserMapping.cpp:234-252, and
verified element-by-element against the literal formulas in
tests/test_rotations.py).  We implement the matrix forms — cleaner, and XLA
fuses them — while the tests pin them to the literal reference expressions.

Angle vectors follow the reference's transform[6] layout:
``[rx, ry, rz, tx, ty, tz]`` == [pitch-like, yaw-like, roll-like, t...]
in the internal camera-style frame (z forward, x left, y up; axis remap at
src/scanRegistration.cpp:244-246).
"""

from __future__ import annotations

import jax.numpy as jnp


def rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def r_yxz(angles):
    """R = Ry(ry) @ Rx(rx) @ Rz(rz) for angles [..., 3] = (rx, ry, rz).

    This is the world-from-body rotation used by pointAssociateToMap
    (src/laserMapping.cpp:234-252) and by the odometry pose transformSum.
    """
    rx, ry, rz = angles[..., 0], angles[..., 1], angles[..., 2]
    return rot_y(ry) @ rot_x(rx) @ rot_z(rz)


def euler_yxz(R):
    """Extract (rx, ry, rz) with R == Ry(ry)@Rx(rx)@Rz(rz).

    Matches the reference's extraction pattern:
    rx = -asin(R[1,2]); ry, rz via atan2 of cos-rx-scaled entries
    (e.g. src/laserOdometry.cpp:225,237,253).
    """
    srx = -R[..., 1, 2]
    rx = jnp.arcsin(jnp.clip(srx, -1.0, 1.0))
    cx = jnp.cos(rx)
    ry = jnp.arctan2(R[..., 0, 2] / cx, R[..., 2, 2] / cx)
    rz = jnp.arctan2(R[..., 1, 0] / cx, R[..., 1, 1] / cx)
    return jnp.stack([rx, ry, rz], -1)


def accumulate_rotation(c_angles, l_angles):
    """AccumulateRotation (src/laserOdometry.cpp:256-273).

    Returns the YXZ angles of R(c) @ R(l); equality with the literal
    reference expressions is pinned in tests/test_rotations.py.
    """
    return euler_yxz(r_yxz(c_angles) @ r_yxz(l_angles))


def plugin_imu_rotation(bc, bl, al):
    """PluginIMURotation (src/laserOdometry.cpp:196-254).

    Returns the YXZ angles of R(bc) @ R(bl)^T @ R(al): replaces the
    solver-estimated start->last rotation bl with the IMU-observed al.
    """
    Rbc = r_yxz(bc)
    Rbl = r_yxz(bl)
    Ral = r_yxz(al)
    return euler_yxz(Rbc @ Rbl.mT @ Ral)


def transform_associate_to_map(transform_sum, transform_bef, transform_aft):
    """transformAssociateToMap (src/laserMapping.cpp:110-197 and
    src/transformMaintenance.cpp:60-145).

    Composes the latest mapping correction onto the current odometry pose:

    * rotation:     angles of R(sum) @ R(bef)^T @ R(aft)
    * translation:  incre = R(bef)-frame motion bef->sum, re-applied around
                    aft:  t_out = t_aft - R(out) @ incre

    where ``incre = R(bef... )``: the reference computes
    transformIncre[3:6] = Rz(sum_z)^T Rx(sum_x)^T Ry(sum_y)^T
    (t_bef - t_sum) (src/laserMapping.cpp:112-124) — i.e. the body-frame
    offset of the pre-mapping pose from the current odometry pose — and
    then maps it through the blended rotation (:184-196).

    All three inputs are 6-vectors [rx,ry,rz,tx,ty,tz]; returns a 6-vector.
    """
    r_sum = transform_sum[:3]
    t_sum = transform_sum[3:]
    r_bef = transform_bef[:3]
    t_bef = transform_bef[3:]
    r_aft = transform_aft[:3]
    t_aft = transform_aft[3:]

    # body-frame increment: R(sum)^T @ (t_bef - t_sum)
    incre = r_yxz(r_sum).mT @ (t_bef - t_sum)

    r_out = euler_yxz(r_yxz(r_sum) @ r_yxz(r_bef).mT @ r_yxz(r_aft))
    t_out = t_aft - r_yxz(r_out) @ incre
    return jnp.concatenate([r_out, t_out])


def apply_pose(pose6, points):
    """pointAssociateToMap (src/laserMapping.cpp:234-252): world point =
    R(r) @ p + t for pose6 [rx,ry,rz,tx,ty,tz], points [..., 3]."""
    R = r_yxz(pose6[:3])
    return points @ R.T + pose6[3:]


def apply_pose_inverse(pose6, points):
    """pointAssociateTobeMapped (src/laserMapping.cpp:254-272):
    body point = R(r)^T @ (p - t)."""
    R = r_yxz(pose6[:3])
    return (points - pose6[3:]) @ R


def rpy_quaternion_wxyz(roll, pitch, yaw):
    """tf::createQuaternionMsgFromRollPitchYaw equivalent (ZYX convention:
    q = Rz(yaw) * Ry(pitch) * Rx(roll)); used only at the output boundary
    (src/laserOdometry.cpp:858, src/laserMapping.cpp:1071)."""
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([w, x, y, z], -1)


def pose6_to_matrix(pose6):
    """4x4 homogeneous world-from-body matrix for a [rx,ry,rz,t] pose."""
    R = r_yxz(pose6[:3])
    M = jnp.eye(4, dtype=pose6.dtype)
    M = M.at[:3, :3].set(R)
    M = M.at[:3, 3].set(pose6[3:])
    return M
