"""The composed 4-node reference graph, sequential.

scanRegistration -> laserOdometry -> (every 2nd frame) laserMapping ->
transformMaintenance, exactly as the rate-decoupled ROS graph runs them
(SURVEY.md §1).  transformMaintenance re-publishes every 10 Hz odometry
pose with the latest 5 Hz mapping correction
(/root/reference/src/transformMaintenance.cpp:147-203).
"""

from __future__ import annotations

import numpy as np

from .registration import ImuOracle, scan_registration
from .odometry import LaserOdometryOracle
from .mapping import LaserMappingOracle, transform_associate_to_map


def run_pipeline(raw_xyz, raw_mask, truncate_upward_scan: bool = True,
                 with_mapping: bool = True):
    """Replay (F, N, 3) raw sweeps through the full reference graph.

    Returns dict of trajectories: odom (F, 6), aft (F, 6; latest mapping
    pose at each frame), integrated (F, 6), plus the per-frame mapping
    flags.
    """
    odo = LaserOdometryOracle(truncate_upward_scan=truncate_upward_scan)
    mapper = LaserMappingOracle() if with_mapping else None

    F = raw_xyz.shape[0]
    odom_traj = np.zeros((F, 6))
    aft_traj = np.zeros((F, 6))
    integ_traj = np.zeros((F, 6))
    mapped = np.zeros(F, dtype=bool)

    # transformMaintenance state (transformMaintenance.cpp:52-58)
    tm_bef = np.zeros(6)
    tm_aft = np.zeros(6)

    for f in range(F):
        feats = scan_registration(raw_xyz[f], raw_mask[f])
        out = odo.handle(feats)
        odom_traj[f] = out["pose"]

        # the mapping sync gate (laserMapping.cpp:411-414) needs the
        # odometry POSE too; the odometry init frame publishes only clouds
        # (laserOdometry.cpp:427-456 continue before the pose publish), so
        # mapping first fires on the first post-init publish frame
        if mapper is not None and out["published"] and f > 0:
            mres = mapper.handle(
                out["pose"], out["corner_last"], out["surf_last"]
            )
            mapped[f] = True
            # odomAftMappedHandler records the published pair
            # (transformMaintenance.cpp:182-203)
            tm_bef = mres["pose_bef"].copy()
            tm_aft = mres["pose_aft"].copy()

        aft_traj[f] = tm_aft
        integ_traj[f] = transform_associate_to_map(
            out["pose"], tm_bef, tm_aft
        )

    return {
        "odom": odom_traj,
        "aft": aft_traj,
        "integrated": integ_traj,
        "mapped": mapped,
    }


def run_pipeline_imu(raw_xyz, raw_mask, imu_t, imu_rpy, imu_acc, t_scans,
                     feed_horizon: float = 0.13):
    """The full reference graph WITH the IMU plumbing of all four nodes:
    per-point deskew in scanRegistration
    (/root/reference/src/scanRegistration.cpp:286-347), velocity prior +
    TransformToEnd IMU tail + PluginIMURotation in laserOdometry
    (:461-463, :126-194, :848-856), and the 0.998/0.002 roll/pitch blend
    in laserMapping (:199-232).

    imu_t (M,), imu_rpy (M, 3) (pitch, yaw, roll), imu_acc (M, 3)
    internal-frame gravity-removed acceleration; t_scans (F,) sweep
    stamps.  Samples are fed to both IMU consumers in arrival order:
    before frame f, everything with t <= t_scans[f] + feed_horizon (the
    messages that would have arrived by the time the callback fires).
    """
    imu = ImuOracle()
    odo = LaserOdometryOracle()
    mapper = LaserMappingOracle()

    F = raw_xyz.shape[0]
    odom_traj = np.zeros((F, 6))
    aft_traj = np.zeros((F, 6))
    integ_traj = np.zeros((F, 6))
    mapped = np.zeros(F, dtype=bool)

    tm_bef = np.zeros(6)
    tm_aft = np.zeros(6)
    fed = 0

    for f in range(F):
        while fed < imu_t.shape[0] and imu_t[fed] <= t_scans[f] + feed_horizon:
            imu.add(
                float(imu_t[fed]), float(imu_rpy[fed, 0]),
                float(imu_rpy[fed, 1]), float(imu_rpy[fed, 2]),
                imu_acc[fed],
            )
            fed += 1

        feats = scan_registration(
            raw_xyz[f], raw_mask[f], imu=imu, t_scan=float(t_scans[f])
        )
        out = odo.handle(feats, imu_trans=feats["imu_trans"])
        odom_traj[f] = out["pose"]

        if out["published"] and f > 0:
            # laserMapping's own IMU buffer: pitch/roll interpolated at
            # timeLaserOdometry + scanPeriod (:203-222)
            tq = float(t_scans[f]) + 0.1
            n_fed = fed
            pr = np.array([
                np.interp(tq, imu_t[:n_fed], imu_rpy[:n_fed, 0]),
                np.interp(tq, imu_t[:n_fed], imu_rpy[:n_fed, 2]),
            ])
            mres = mapper.handle(
                out["pose"], out["corner_last"], out["surf_last"],
                imu_pitch_roll=pr,
            )
            mapped[f] = True
            tm_bef = mres["pose_bef"].copy()
            tm_aft = mres["pose_aft"].copy()

        aft_traj[f] = tm_aft
        integ_traj[f] = transform_associate_to_map(
            out["pose"], tm_bef, tm_aft
        )

    return {
        "odom": odom_traj,
        "aft": aft_traj,
        "integrated": integ_traj,
        "mapped": mapped,
    }
