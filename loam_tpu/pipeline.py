"""Full-pipeline replay: the four reference processes as one program.

The reference runs scanRegistration -> laserOdometry -> laserMapping ->
transformMaintenance as rate-decoupled ROS nodes with 5 ms sync gates
(SURVEY.md §1).  Here the sweep-independent frontend (ingest + feature
extraction) is *batched over frames* with vmap — embarrassingly parallel,
so it fills the TPU — while the inherently recurrent odometry/mapping core
runs as a lax.scan.  The skip-frame cadence (mapping at every 2nd frame,
src/laserOdometry.cpp:51) is a lax.cond inside the scan; sync gates vanish
because data dependencies are explicit.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .config import LoamConfig
from .types import FeatureClouds, ImuTrans
from . import frontend, odometry, mapping
from .ops.features import extract_features
from .utils import rotations


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PipelineState:
    odom: odometry.OdomState
    map: mapping.MapState

    @staticmethod
    def create(cfg: LoamConfig) -> "PipelineState":
        return PipelineState(
            odom=odometry.OdomState.create(cfg),
            map=mapping.MapState.create(cfg),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameOutput:
    pose_odom: jax.Array       # (6,) /laser_odom_to_init
    pose_aft: jax.Array        # (6,) /aft_mapped_to_init (latest)
    pose_integrated: jax.Array  # (6,) /integrated_to_init
    mapped: jax.Array          # () bool — mapping ran this frame
    # /velodyne_cloud_registered (cfg.emit_registered only): the full-res
    # sweep in the map frame; mask all-False on non-mapping frames
    registered: "object" = None


def mapping_frame(k: int, cfg: LoamConfig) -> bool:
    """Whether mapping runs at (0-based) frame k — the host-side mirror
    of the odometry's skip-frame counter: frame 0 is the init frame
    (publishes clouds, no pose, src/laserOdometry.cpp:427-456), the
    counter starts at skipFrameNum so the FIRST solve publishes, then
    every (skipFrameNum+1)-th (src/laserOdometry.cpp:51,466-474,886)."""
    return k >= 1 and (k - 1) % (cfg.skip_frame_num + 1) == 0


def pipeline_step(state: PipelineState, feats: FeatureClouds,
                  imu: ImuTrans | None, cfg: LoamConfig,
                  map_rpy: jax.Array | None = None,
                  do_mapping: bool | None = None):
    """One frame through odometry -> (every 2nd frame) mapping ->
    integration.

    map_rpy: optional (2,) [pitch, roll] — the IMU stream interpolated at
    the sweep-end time t_scan + scanPeriod, consumed by the mapping
    0.998/0.002 blend (src/laserMapping.cpp:203-225).

    do_mapping: static cadence override.  None (default) keeps the
    runtime lax.cond on the odometry's publish flag — correct anywhere,
    but under vmap (scenario-batched replay) a batched cond lowers to
    both-branches-plus-select, paying the mapping solve on EVERY frame.
    The skip-frame cadence is a pure function of the frame index
    (mapping at frames 1, 1+(skip+1), ...: src/laserOdometry.cpp:51,886),
    identical across lockstep scenarios, so a host/pair-scan driver can
    resolve it statically: True runs mapping unconditionally, False skips
    it.  Callers must match the odometry cadence (see mapping_frame)."""
    odom_state, odom_out = odometry.odometry_step(state.odom, feats, imu, cfg)
    full = odom_out.full if cfg.emit_registered else None

    def run_mapping(ms):
        return mapping.mapping_step(
            ms, odom_out.pose, odom_out.corner_last, odom_out.surf_last,
            map_rpy, cfg, full=full,
        )

    def skip_mapping(ms):
        reg = None
        if full is not None:
            reg = full.replace(
                xyz=jnp.zeros_like(full.xyz),
                mask=jnp.zeros_like(full.mask),
            )
        return ms, mapping.MapOutput(
            pose_aft=ms.transform_aft,
            pose_bef=ms.transform_bef,
            solved=jnp.array(False),
            registered=reg,
        )

    if do_mapping is None:
        map_state, map_out = jax.lax.cond(
            odom_out.publish_to_mapping, run_mapping, skip_mapping, state.map
        )
    elif do_mapping:
        map_state, map_out = run_mapping(state.map)
    else:
        map_state, map_out = skip_mapping(state.map)

    # transformMaintenance (src/transformMaintenance.cpp:147-180): re-apply
    # the latest mapping correction to the 10 Hz odometry pose
    integrated = rotations.transform_associate_to_map(
        odom_out.pose, map_state.transform_bef, map_state.transform_aft
    )

    new_state = PipelineState(odom=odom_state, map=map_state)
    out = FrameOutput(
        pose_odom=odom_out.pose,
        pose_aft=map_state.transform_aft,
        pose_integrated=integrated,
        mapped=odom_out.publish_to_mapping,
        registered=map_out.registered,
    )
    return new_state, out


@functools.partial(jax.jit, static_argnames=("cfg", "return_state"))
def replay_sweeps(raw_xyz, raw_mask, cfg: LoamConfig = LoamConfig(),
                  imu_streams=None, t_scans=None, *,
                  state0: "PipelineState | None" = None,
                  return_state: bool = False):
    """Sequential replay of a sweep sequence.

    raw_xyz: (F, N, 3) raw Velodyne clouds; raw_mask: (F, N).
    imu_streams: optional per-frame ImuStream (leading F axis) — each
    frame's slice of the IMU circular buffer; t_scans: (F,) sweep start
    times.  With IMU attached, the frontend deskews each point into the
    sweep-start IMU frame and the odometry/mapping consume the per-sweep
    ImuTrans (SURVEY.md §2 C2/C3/C10/C16).

    The frontend runs vmapped over all frames at once; the recurrent core
    is a lax.scan.  Returns FrameOutput with leading F axis.
    """
    if imu_streams is not None:
        from . import imu as imu_mod

        integ = jax.vmap(lambda s: imu_mod.integrate(s, cfg))(imu_streams)
        sweeps, imu_trans = jax.vmap(
            lambda x, m, s, g, t: frontend.ingest_sweep_imu(
                x, m, cfg, s, g, t
            )
        )(raw_xyz, raw_mask, imu_streams, integ, t_scans)
        # mapping blend input: IMU rpy at the sweep-end timestamp
        # t_scan + scanPeriod (src/laserMapping.cpp:203-225)
        def _map_rpy(s, t):
            rpy, ok = imu_mod.rpy_at(s, t + cfg.scan_period)
            return jnp.stack(
                [rpy[0], rpy[2], ok.astype(jnp.float32)]
            )

        map_rpy = jax.vmap(_map_rpy)(imu_streams, t_scans)
    else:
        sweeps, imu_trans = jax.vmap(
            lambda x, m: frontend.ingest_sweep_imu(x, m, cfg)
        )(raw_xyz, raw_mask)
        map_rpy = None
    feats = jax.vmap(lambda s: extract_features(s, cfg))(sweeps)

    if state0 is None:
        state0 = PipelineState.create(cfg)
    use_imu = imu_streams is not None

    if use_imu:
        def step(state, inp):
            f, it, mr = inp
            return pipeline_step(state, f, it, cfg, map_rpy=mr)

        final, outs = jax.lax.scan(step, state0, (feats, imu_trans, map_rpy))
    else:
        def step(state, inp):
            f, it = inp
            return pipeline_step(state, f, None, cfg)

        final, outs = jax.lax.scan(step, state0, (feats, imu_trans))
    if return_state:
        return outs, final
    return outs


def replay_features_cadenced(feats: FeatureClouds,
                             cfg: LoamConfig = LoamConfig(),
                             state0: "PipelineState | None" = None):
    """Sequential replay with the mapping cadence resolved STATICALLY.

    The skip-frame schedule is a pure function of the frame index
    (mapping at frames 1, 1+(skip+1), ...; src/laserOdometry.cpp:51,886),
    so instead of a runtime lax.cond on the odometry's publish flag —
    which under vmap lowers to both-branches-plus-select and pays the
    mapping solve on EVERY frame — the scan body handles one full cadence
    period: 1 mapping frame + `skip_frame_num` odometry-only frames,
    each pipeline_step with a static do_mapping.  Frame 0 (the odometry
    init frame, no mapping) runs before the scan.

    feats: FeatureClouds with leading F axis, F = 1 + n*(skip+1).
    One jit dispatch replays the whole sequence (vs one per frame),
    which matters when the device sits behind a high-latency transport.
    Returns (FrameOutput with leading F axis, final PipelineState).
    """
    F = feats.sharp.mask.shape[0]
    period = cfg.skip_frame_num + 1
    assert (F - 1) % period == 0, (
        f"F={F} must be 1 + n*{period} for the static cadence scan"
    )
    if state0 is None:
        state0 = PipelineState.create(cfg)

    f0 = jax.tree_util.tree_map(lambda x: x[0], feats)
    rest = jax.tree_util.tree_map(
        lambda x: x[1:].reshape(((F - 1) // period, period) + x.shape[1:]),
        feats,
    )
    state, out0 = pipeline_step(state0, f0, None, cfg, do_mapping=False)

    def period_step(state, fp):
        outs = []
        for j in range(period):
            fj = jax.tree_util.tree_map(lambda x: x[j], fp)
            state, o = pipeline_step(
                state, fj, None, cfg, do_mapping=(j == 0)
            )
            outs.append(o)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *outs
        )
        return state, stacked

    final, outs = jax.lax.scan(period_step, state, rest)
    outs = jax.tree_util.tree_map(
        lambda x: x.reshape((F - 1,) + x.shape[2:]), outs
    )
    all_outs = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a[None], b]), out0, outs
    )
    return all_outs, final


@functools.partial(jax.jit, static_argnames=("cfg", "with_imu"))
def replay_features(feats: FeatureClouds, cfg: LoamConfig = LoamConfig(),
                    imu_trans: ImuTrans | None = None, with_imu: bool = False):
    """Replay from pre-extracted features (leading F axis) — the scan-only
    core, used by benchmarks to time the recurrent stages separately."""
    state0 = PipelineState.create(cfg)
    if with_imu and imu_trans is not None:
        def step(state, inp):
            f, it = inp
            return pipeline_step(state, f, it, cfg)

        _, outs = jax.lax.scan(step, state0, (feats, imu_trans))
    else:
        def step(state, f):
            return pipeline_step(state, f, None, cfg)

        _, outs = jax.lax.scan(step, state0, feats)
    return outs
