"""Sweep ingest: raw Velodyne cloud -> ring-organized Sweep.

Component C1 of SURVEY.md §2 (src/scanRegistration.cpp:211-357): axis
remap, elevation->ring id, azimuth unwrap -> relative time, ring-major
reorganization.  Fully vectorized: the reference's sequential
``halfPassed`` state machine is replaced by a cumulative-sum phase unwrap,
exact for monotonic rotation (which a spinning lidar guarantees and the
reference implicitly assumes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .config import LoamConfig
from .types import Sweep


def velodyne_to_internal(xyz_velo):
    """Axis remap (x,y,z)_velo -> internal (y, z, x)
    (src/scanRegistration.cpp:244-246): z forward, x left, y up."""
    return jnp.stack(
        [xyz_velo[..., 1], xyz_velo[..., 2], xyz_velo[..., 0]], -1
    )


def ring_id(xyz_internal, n_scans: int):
    """VLP-16 elevation -> scan id (src/scanRegistration.cpp:248-256).

    angle = atan(y / sqrt(x^2+z^2)) in degrees, rounded half-away-from-zero
    with C truncation; positive angles map to odd ids 1..15, negatives to
    even ids 0..14 (the laboshinl VLP-16 interleave).
    Returns (scan_id, in_range).
    """
    x, y, z = (
        xyz_internal[..., 0],
        xyz_internal[..., 1],
        xyz_internal[..., 2],
    )
    angle = jnp.degrees(jnp.arctan2(y, jnp.sqrt(x * x + z * z)))
    rounded = jnp.trunc(
        angle + jnp.where(angle < 0.0, -0.5, 0.5)
    ).astype(jnp.int32)
    scan_id = jnp.where(rounded > 0, rounded, rounded + (n_scans - 1))
    ok = (scan_id >= 0) & (scan_id <= n_scans - 1)
    return scan_id, ok


def unwrap_azimuth(ori, mask):
    """Monotonic phase unwrap of ori = -atan2(x, z) over arrival order.

    Replaces the halfPassed state machine
    (src/scanRegistration.cpp:262-281): the reference pins each point's
    azimuth to a continuously increasing phase from startOri to
    endOri ~= startOri + 2*pi.  For a monotonically rotating scanner both
    give identical relTime.  Invalid points inherit the running phase.
    """
    # first valid ori
    n = ori.shape[0]
    first_idx = jnp.argmax(mask)
    start = ori[first_idx]
    # per-step wrapped delta in (-pi, pi], zero for invalid slots
    prev = jnp.concatenate([ori[:1], ori[:-1]])
    prev_valid = jnp.concatenate([mask[:1], mask[:-1]])
    # carry forward last valid ori: use cumulative trick via segment scan
    # (simple approach: replace invalid ori with previous valid via
    #  jax.lax.associative_scan on (value, is_valid))
    def combine(a, b):
        av, am = a
        bv, bm = b
        return jnp.where(bm, bv, av), am | bm

    filled, _ = jax.lax.associative_scan(
        combine, (jnp.where(mask, ori, 0.0), mask)
    )
    prev_filled = jnp.concatenate([filled[:1], filled[:-1]])
    delta = ori - prev_filled
    delta = jnp.mod(delta + jnp.pi, 2 * jnp.pi) - jnp.pi
    delta = jnp.where(mask & (jnp.arange(n) > first_idx), delta, 0.0)
    unwrapped = start + jnp.cumsum(delta)
    del prev, prev_valid
    return unwrapped, start


@functools.partial(jax.jit, static_argnames=("cfg",))
def ingest_sweep(xyz_velo, mask, cfg: LoamConfig = LoamConfig(),
                 imu_stream=None, imu_integ=None, t_scan=None) -> Sweep:
    """Organize one raw sweep (N, 3) + validity mask into a ring-major
    Sweep with the ring + scanPeriod*relTime channel
    (src/scanRegistration.cpp:283-284, :350-357).

    With an IMU stream attached, each point is additionally transformed
    into the sweep-start IMU frame (the reference's per-point
    ShiftToStartIMU/TransformToStartIMU deskew, :286-347).  Ring ids and
    azimuth times are computed from the raw geometry first, exactly as the
    reference does.  Use ``ingest_sweep_imu`` to also get the ImuTrans.
    """
    sweep, _ = ingest_sweep_imu(
        xyz_velo, mask, cfg, imu_stream, imu_integ, t_scan
    )
    return sweep


@functools.partial(jax.jit, static_argnames=("cfg",))
def ingest_sweep_imu(xyz_velo, mask, cfg: LoamConfig = LoamConfig(),
                     imu_stream=None, imu_integ=None, t_scan=None):
    """ingest_sweep + the per-sweep ImuTrans summary
    (src/scanRegistration.cpp:614-629).  Returns (Sweep, ImuTrans)."""
    from . import imu as imu_mod
    from .types import ImuTrans

    xyz = velodyne_to_internal(xyz_velo.astype(jnp.float32))
    scan_id, ring_ok = ring_id(xyz, cfg.n_scans)
    valid = mask & ring_ok

    ori = -jnp.arctan2(xyz[..., 0], xyz[..., 2])
    unwrapped, start = unwrap_azimuth(ori, valid)
    # endOri: last valid unwrapped phase; reference forces it into
    # (startOri + pi, startOri + 3*pi) (src/scanRegistration.cpp:234-238)
    n = xyz.shape[0]
    last_idx = n - 1 - jnp.argmax(valid[::-1])
    end = unwrapped[last_idx]
    span = jnp.where(jnp.abs(end - start) < 1e-6, 2 * jnp.pi, end - start)
    rel_time = (unwrapped - start) / span
    rel = scan_id.astype(jnp.float32) + cfg.scan_period * rel_time

    if imu_stream is not None:
        s_imu = imu_mod.sweep_state(
            imu_stream, imu_integ, t_scan, rel_time, valid, cfg
        )
        deskewed = imu_mod.deskew_points(xyz, s_imu)
        use = s_imu.valid & valid
        xyz = jnp.where(use[..., None], deskewed, xyz)
        imu_trans = imu_mod.imu_trans(s_imu)
    else:
        imu_trans = ImuTrans.zeros()

    # ring-major reorganization: stable sort by ring, then GATHER each
    # (ring, rank) output slot's source point.  Sorted position of slot
    # (r, w) is ring_starts[r] + w, valid iff w < counts[r] — the exact
    # inverse of the scatter it replaces (bit-identical output), but
    # with no scatter: TPU scatters serialize and dominated ingest at
    # large scenario batch.
    ring_key = jnp.where(valid, scan_id, cfg.n_scans)
    order = jnp.argsort(ring_key, stable=True)
    counts = jnp.sum(
        (ring_key[None, :] == jnp.arange(cfg.n_scans)[:, None]), axis=1
    )
    ring_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts.astype(jnp.int32))[:-1]]
    )

    W = cfg.ring_width
    w_iota = jnp.arange(W)[None, :]
    src_pos = ring_starts[:, None] + w_iota               # (n_scans, W)
    ok = w_iota < counts[:, None]
    src = order[jnp.clip(src_pos, 0, n - 1)]
    sweep = Sweep(
        xyz=jnp.where(ok[..., None], xyz[src], 0.0),
        rel=jnp.where(ok, rel[src], 0.0),
        mask=ok,
    )
    return sweep, imu_trans
