"""The composed 4-node reference graph, sequential.

scanRegistration -> laserOdometry -> (every 2nd frame) laserMapping ->
transformMaintenance, exactly as the rate-decoupled ROS graph runs them
(SURVEY.md §1).  transformMaintenance re-publishes every 10 Hz odometry
pose with the latest 5 Hz mapping correction
(/root/reference/src/transformMaintenance.cpp:147-203).
"""

from __future__ import annotations

import numpy as np

from .registration import scan_registration
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
