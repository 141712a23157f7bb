"""IMU dead-reckoning and per-point deskew (components C2/C3, SURVEY.md §2).

The reference maintains a 200-entry circular buffer of IMU orientation,
gravity-removed acceleration, and dead-reckoned velocity/position
(src/scanRegistration.cpp:68-99,173-209,638-660), then interpolates that
state to each lidar point's timestamp and transforms the point into the
sweep-start IMU frame (:286-347).

TPU-native, the stream is a fixed-capacity padded array; dead-reckoning is
a cumulative sum (associative, so it vectorizes/scans cleanly), and the
per-point interpolation is a searchsorted + gather over the whole sweep at
once instead of the reference's pointer-walking loop.

Conventions (internal camera-style frame: x left, y up, z forward):
* IMU world-from-body rotation R = Ry(yaw) @ Rx(pitch) @ Rz(roll)
  (rotation sequence of TransformToStartIMU, src/scanRegistration.cpp:146-170).
* Angle triples are stored as (pitch, yaw, roll) == (rx, ry, rz), the
  layout of the imuTrans message (src/scanRegistration.cpp:614-629).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .config import LoamConfig
from .types import ImuTrans

_BIG_TIME = jnp.float32(1e18)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ImuStream:
    """Padded IMU sample stream (the circular buffer, vectorized).

    t:    (M,) float32 sample times, strictly increasing on valid slots.
    rpy:  (M, 3) (pitch, yaw, roll) == (rx, ry, rz) orientation.
    acc:  (M, 3) gravity-removed linear acceleration in the internal BODY
          frame (the axis-swizzled, gravity-subtracted accelerations the
          handler computes, src/scanRegistration.cpp:643-647).
    mask: (M,) validity.
    """

    t: jax.Array
    rpy: jax.Array
    acc: jax.Array
    mask: jax.Array

    @staticmethod
    def zeros(m: int) -> "ImuStream":
        return ImuStream(
            t=jnp.zeros((m,), jnp.float32),
            rpy=jnp.zeros((m, 3), jnp.float32),
            acc=jnp.zeros((m, 3), jnp.float32),
            mask=jnp.zeros((m,), bool),
        )


def imu_from_raw(t, quat_rpy, lin_acc_velodyne, mask):
    """The imuHandler conversion (src/scanRegistration.cpp:638-652):
    orientation RPY + raw velodyne-frame linear acceleration ->
    internal-frame gravity-removed acceleration.

    accX = a.y - sin(roll) cos(pitch) g
    accY = a.z - cos(roll) cos(pitch) g
    accZ = a.x + sin(pitch) g

    quat_rpy: (M, 3) (roll, pitch, yaw) as extracted from the orientation
    quaternion.  Returns an ImuStream.
    """
    g = jnp.float32(9.81)
    roll = quat_rpy[:, 0]
    pitch = quat_rpy[:, 1]
    yaw = quat_rpy[:, 2]
    ax = lin_acc_velodyne[:, 1] - jnp.sin(roll) * jnp.cos(pitch) * g
    ay = lin_acc_velodyne[:, 2] - jnp.cos(roll) * jnp.cos(pitch) * g
    az = lin_acc_velodyne[:, 0] + jnp.sin(pitch) * g
    return ImuStream(
        t=t.astype(jnp.float32),
        rpy=jnp.stack([pitch, yaw, roll], -1).astype(jnp.float32),
        acc=jnp.stack([ax, ay, az], -1).astype(jnp.float32),
        mask=mask,
    )


def _r_imu(rpy):
    """World-from-body: Ry(yaw) @ Rx(pitch) @ Rz(roll) for (pitch, yaw,
    roll) triples [..., 3] — same matrix family as rotations.r_yxz with
    the (rx, ry, rz) identification."""
    from .utils import rotations

    return rotations.r_yxz(rpy)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ImuIntegral:
    """Dead-reckoned world-frame velocity and position per IMU sample."""

    velo: jax.Array   # (M, 3)
    shift: jax.Array  # (M, 3)


@functools.partial(jax.jit, static_argnames=("cfg",))
def integrate(stream: ImuStream, cfg: LoamConfig = LoamConfig()) -> ImuIntegral:
    """AccumulateIMUShift over the whole stream
    (src/scanRegistration.cpp:173-209), vectorized.

    World acceleration = R(rpy) @ acc_body; constant-acceleration
    integration per interval.  Intervals with dt >= scanPeriod (stream
    gaps) contribute nothing, freezing velocity/position across the gap —
    the reference's `if (timeDiff < scanPeriod)` guard.
    """
    acc_w = jnp.einsum("mij,mj->mi", _r_imu(stream.rpy), stream.acc)
    dt = jnp.diff(stream.t, prepend=stream.t[:1])
    prev_valid = jnp.concatenate([stream.mask[:1] & False, stream.mask[:-1]])
    ok = stream.mask & prev_valid & (dt > 0.0) & (dt < cfg.scan_period)
    dt = jnp.where(ok, dt, 0.0)

    dv = acc_w * dt[:, None]
    velo = jnp.cumsum(dv, axis=0)
    # shift_k = shift_{k-1} + velo_{k-1} dt + 0.5 acc dt^2
    velo_prev = jnp.concatenate([jnp.zeros((1, 3), velo.dtype), velo[:-1]])
    ds = velo_prev * dt[:, None] + 0.5 * acc_w * dt[:, None] ** 2
    shift = jnp.cumsum(ds, axis=0)
    return ImuIntegral(velo=velo, shift=shift)


def _interp_series(tq, t, series, mask, wrap=None):
    """Linear interpolation of a padded series at query times tq.

    Clamps to the last sample when tq is beyond the stream (the
    reference's `timeScanCur + pointTime > imuTime[front]` branch) and to
    the first when before.  wrap='angle' applies the reference's +-pi yaw
    unwrap between bracketing samples (src/scanRegistration.cpp:316-323).
    """
    t_pad = jnp.where(mask, t, _BIG_TIME)
    idx_hi = jnp.searchsorted(t_pad, tq, side="right")
    n_valid = jnp.sum(mask.astype(jnp.int32))
    idx_hi = jnp.clip(idx_hi, 1, jnp.maximum(n_valid - 1, 1))
    idx_lo = idx_hi - 1
    t_lo = t[idx_lo]
    t_hi = t[idx_hi]
    denom = jnp.where(jnp.abs(t_hi - t_lo) < 1e-9, 1.0, t_hi - t_lo)
    w_hi = jnp.clip((tq - t_lo) / denom, 0.0, 1.0)
    v_lo = series[idx_lo]
    v_hi = series[idx_hi]
    if wrap == "angle":
        diff = v_hi - v_lo
        v_lo = jnp.where(diff > jnp.pi, v_lo + 2 * jnp.pi, v_lo)
        v_lo = jnp.where(diff < -jnp.pi, v_lo - 2 * jnp.pi, v_lo)
    if series.ndim > 1:
        w_hi = w_hi[..., None]
    return v_hi * w_hi + v_lo * (1.0 - w_hi)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SweepImu:
    """Per-sweep IMU deskew data: interpolated start state + per-point
    current state, ready for the frontend."""

    rpy_start: jax.Array          # (3,) (pitch, yaw, roll)
    rpy_pt: jax.Array             # (..., 3) per-point orientation
    shift_from_start: jax.Array   # (..., 3) start-frame drift per point
    velo_from_start_last: jax.Array  # (3,)
    rpy_last: jax.Array           # (3,)
    shift_from_start_last: jax.Array  # (3,)
    valid: jax.Array              # () bool — IMU data covered the sweep


@functools.partial(jax.jit, static_argnames=("cfg",))
def sweep_state(stream: ImuStream, integ: ImuIntegral, t_scan,
                rel_time, point_mask,
                cfg: LoamConfig = LoamConfig()) -> SweepImu:
    """Interpolate the IMU state at every point of a sweep
    (src/scanRegistration.cpp:286-347) and form the start-frame drift.

    t_scan: () sweep start time; rel_time: (...,) per-point normalized
    sweep fraction in [0, 1].
    """
    tq = t_scan + rel_time * cfg.scan_period

    # per-point interpolated state (yaw needs the wrap fix)
    py = _interp_series(tq, stream.t, stream.rpy[:, 0], stream.mask)
    yw = _interp_series(
        tq, stream.t, stream.rpy[:, 1], stream.mask, wrap="angle"
    )
    rl = _interp_series(tq, stream.t, stream.rpy[:, 2], stream.mask)
    rpy_pt = jnp.stack([py, yw, rl], -1)
    velo_pt = _interp_series(tq, stream.t, integ.velo, stream.mask)
    shift_pt = _interp_series(tq, stream.t, integ.shift, stream.mask)

    # start state = interpolation at the first valid point's time
    flat_mask = point_mask.reshape(-1)
    flat_t = jnp.where(flat_mask, rel_time.reshape(-1), jnp.inf)
    i0 = jnp.argmin(flat_t)
    t0 = t_scan + jnp.where(
        jnp.isfinite(flat_t[i0]), flat_t[i0], 0.0
    ) * cfg.scan_period
    rpy_start = jnp.stack([
        _interp_series(t0[None], stream.t, stream.rpy[:, 0], stream.mask)[0],
        _interp_series(
            t0[None], stream.t, stream.rpy[:, 1], stream.mask, wrap="angle"
        )[0],
        _interp_series(t0[None], stream.t, stream.rpy[:, 2], stream.mask)[0],
    ])
    velo_start = _interp_series(t0[None], stream.t, integ.velo, stream.mask)[0]
    shift_start = _interp_series(
        t0[None], stream.t, integ.shift, stream.mask
    )[0]

    # ShiftToStartIMU (:108-125): world drift minus linear prediction,
    # rotated into the start IMU frame
    pt_time = (tq - t0)[..., None]
    drift_w = shift_pt - shift_start[None, :] - velo_start[None, :] * pt_time
    R_start = _r_imu(rpy_start)
    shift_from_start = drift_w @ R_start  # == R_start^T @ drift

    # last point state (the "Cur" values after the loop = state at the
    # final processed point)
    flat_t_last = jnp.where(flat_mask, rel_time.reshape(-1), -jnp.inf)
    il = jnp.argmax(flat_t_last)
    rpy_last = rpy_pt.reshape(-1, 3)[il]
    velo_last = velo_pt.reshape(-1, 3)[il]
    shift_last = shift_from_start.reshape(-1, 3)[il]
    velo_from_start_last = (velo_last - velo_start) @ R_start

    valid = jnp.sum(stream.mask.astype(jnp.int32)) >= 2
    return SweepImu(
        rpy_start=rpy_start,
        rpy_pt=rpy_pt,
        shift_from_start=shift_from_start,
        velo_from_start_last=velo_from_start_last,
        rpy_last=rpy_last,
        shift_from_start_last=shift_last,
        valid=valid,
    )


def rpy_at(stream: ImuStream, t):
    """Interpolate the stream's (pitch, yaw, roll) orientation at time t
    — the laserMapping IMU-buffer lookup at
    timeLaserOdometry + scanPeriod (src/laserMapping.cpp:203-222).

    Returns ((3,) rpy, () valid)."""
    py = _interp_series(t[None], stream.t, stream.rpy[:, 0], stream.mask)[0]
    yw = _interp_series(
        t[None], stream.t, stream.rpy[:, 1], stream.mask, wrap="angle"
    )[0]
    rl = _interp_series(t[None], stream.t, stream.rpy[:, 2], stream.mask)[0]
    valid = jnp.sum(stream.mask.astype(jnp.int32)) >= 2
    return jnp.stack([py, yw, rl]), valid


def deskew_points(xyz, sweep_imu: SweepImu):
    """TransformToStartIMU for every point
    (src/scanRegistration.cpp:146-171):

        p <- R_start^T @ R_cur @ p + shiftFromStart

    removes the nonlinear (non-constant-velocity) motion over the sweep.
    """
    R_cur = _r_imu(sweep_imu.rpy_pt)
    R_start = _r_imu(sweep_imu.rpy_start)
    p_w = jnp.einsum("...ij,...j->...i", R_cur, xyz)
    return p_w @ R_start + sweep_imu.shift_from_start


def imu_trans(sweep_imu: SweepImu) -> ImuTrans:
    """The 4-point imuTrans summary the odometry consumes
    (src/scanRegistration.cpp:614-629)."""
    z = jnp.zeros((3,), jnp.float32)
    v = sweep_imu.valid
    return ImuTrans(
        rpy_start=jnp.where(v, sweep_imu.rpy_start, z),
        rpy_cur=jnp.where(v, sweep_imu.rpy_last, z),
        shift_from_start=jnp.where(v, sweep_imu.shift_from_start_last, z),
        velo_from_start=jnp.where(v, sweep_imu.velo_from_start_last, z),
    )
