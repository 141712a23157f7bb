"""Core array containers for the TPU-native LOAM engine.

Everything is a fixed-capacity struct-of-arrays with an explicit validity
mask — the TPU replacement for the reference's dynamically sized
pcl::PointCloud (which itself hides static 40000-entry scratch arrays,
src/scanRegistration.cpp:63-66).  All containers are registered pytrees so
they flow through jit / vmap / scan / shard_map.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PointCloud:
    """Padded point cloud.

    xyz:  (N, 3) float32 — coordinates in the internal camera-style frame
          (z forward, x left, y up; src/scanRegistration.cpp:244-246).
    rel:  (N,)  float32 — the reference's "intensity" channel:
          scanID + scanPeriod * relTime (src/scanRegistration.cpp:284);
          int(rel) = ring id, 10*frac(rel) = normalized sweep time s
          (src/laserOdometry.cpp:103).
    mask: (N,)  bool — validity of each slot.
    """

    xyz: jax.Array
    rel: jax.Array
    mask: jax.Array

    @staticmethod
    def zeros(n: int, dtype=jnp.float32) -> "PointCloud":
        return PointCloud(
            xyz=jnp.zeros((n, 3), dtype),
            rel=jnp.zeros((n,), dtype),
            mask=jnp.zeros((n,), bool),
        )

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def ring(self) -> jax.Array:
        """Integer ring id (int(intensity) in the reference).

        C int() truncates toward zero — NOT floor.  A ring-0 point with a
        slightly negative relTime has intensity -eps; the reference
        decodes ring 0 and s = -10*eps, while floor would give ring -1
        and s ~= 10."""
        return jnp.trunc(self.rel).astype(jnp.int32)

    def sweep_time(self) -> jax.Array:
        """Normalized point time s:
        s = 10 * (intensity - int(intensity)), src/laserOdometry.cpp:103,
        with C truncation semantics (may be slightly negative at the
        sweep-start seam, exactly as in the reference)."""
        return 10.0 * (self.rel - jnp.trunc(self.rel))

    def replace(self, **kw) -> "PointCloud":
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Sweep:
    """One raw sweep in ring-major layout.

    xyz:  (n_scans, W, 3) — internal frame, azimuth/time order per ring.
    rel:  (n_scans, W)    — ring + scanPeriod*relTime encoding.
    mask: (n_scans, W)    — validity.
    """

    xyz: jax.Array
    rel: jax.Array
    mask: jax.Array

    def flatten(self) -> PointCloud:
        n = self.xyz.shape[0] * self.xyz.shape[1]
        return PointCloud(
            xyz=self.xyz.reshape(n, 3),
            rel=self.rel.reshape(n),
            mask=self.mask.reshape(n),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FeatureClouds:
    """Output of feature extraction — the five published clouds of
    scanRegistration (src/scanRegistration.cpp:584-612)."""

    sharp: PointCloud        # /laser_cloud_sharp
    less_sharp: PointCloud   # /laser_cloud_less_sharp
    flat: PointCloud         # /laser_cloud_flat
    less_flat: PointCloud    # /laser_cloud_less_flat (0.2 m downsampled)
    full: PointCloud         # /velodyne_cloud_2 (deskewed full cloud)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ImuTrans:
    """The 4-point "imuTrans" message (src/scanRegistration.cpp:614-629):
    per-sweep IMU summary consumed by the odometry."""

    rpy_start: jax.Array        # (3,) pitch,yaw,roll at sweep start
    rpy_cur: jax.Array          # (3,) pitch,yaw,roll at sweep end
    shift_from_start: jax.Array  # (3,) nonlinear-motion drift
    velo_from_start: jax.Array   # (3,) velocity change over the sweep

    @staticmethod
    def zeros(dtype=jnp.float32) -> "ImuTrans":
        z = jnp.zeros((3,), dtype)
        return ImuTrans(z, z, z, z)
