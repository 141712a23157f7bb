"""Scan-to-scan odometry: components C6-C11 of SURVEY.md §2
(src/laserOdometry.cpp).

The reference's 100 Hz polling node becomes one pure function
``odometry_step``: correspondence search (masked brute-force NN instead of
FLANN kd-trees), point-to-line / point-to-plane Gauss-Newton with the
degeneracy projector and the fork's NaN guard, Euler pose accumulation
with the 1.05 empirical scale, and end-of-sweep reprojection of the
feature clouds that become the next frame's reference.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .config import LoamConfig
from .types import FeatureClouds, ImuTrans, PointCloud
from .ops import nn, residuals
from .ops.deskew import transform_to_start, transform_to_end
from .utils import linalg, rotations


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OdomState:
    corner_last: PointCloud      # previous less-sharp, end-projected
    surf_last: PointCloud        # previous less-flat, end-projected
    transform: jax.Array         # (6,) frame-to-frame motion (warm start)
    transform_sum: jax.Array     # (6,) accumulated odometry pose
    initialized: jax.Array      # () bool
    frame_count: jax.Array      # () int32 (skip-frame phase)
    nan_skips: jax.Array        # () int32 — NaN-guard activations

    @staticmethod
    def create(cfg: LoamConfig) -> "OdomState":
        return OdomState(
            corner_last=PointCloud.zeros(cfg.max_less_sharp),
            surf_last=PointCloud.zeros(cfg.max_less_flat),
            transform=jnp.zeros(6, jnp.float32),
            transform_sum=jnp.zeros(6, jnp.float32),
            initialized=jnp.array(False),
            frame_count=jnp.array(1, jnp.int32),  # = skipFrameNum
            nan_skips=jnp.array(0, jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OdomOutput:
    pose: jax.Array              # (6,) /laser_odom_to_init equivalent
    corner_last: PointCloud      # /laser_cloud_corner_last
    surf_last: PointCloud        # /laser_cloud_surf_last
    full: PointCloud             # /velodyne_cloud_3
    publish_to_mapping: jax.Array  # () bool — the skipFrameNum cadence


# ---------------------------------------------------------------------------
# correspondence search
# ---------------------------------------------------------------------------

def _scan_bounds(col, j1, ring, cr, cfg: LoamConfig):
    """Vectorized equivalent of the reference's break-bounded index walks
    outward from the 1-NN (src/laserOdometry.cpp:486-524,598-645).

    The upward walk stops at the first index whose ring id exceeds
    cr + ring_window (and, under the loop-bound quirk, at the current
    feature count); the downward walk stops at the first index whose ring
    id drops below cr - ring_window.  Returns (up, dn) boolean masks of
    the walked index ranges (exclusive of the break point and j1)."""
    w = jnp.float32(cfg.ring_window)
    rq = ring[None, :].astype(jnp.float32)
    crq = cr[:, None].astype(jnp.float32)
    above = (col > j1[:, None]) & (rq > crq + w)
    brk_up = jnp.where(
        jnp.any(above, axis=1), jnp.argmax(above, axis=1), ring.shape[0]
    )
    below = (col < j1[:, None]) & (rq < crq - w)
    # last index below j1 violating the window: flip, argmax, unflip
    below_r = below[:, ::-1]
    brk_dn = jnp.where(
        jnp.any(below, axis=1),
        ring.shape[0] - 1 - jnp.argmax(below_r, axis=1),
        -1,
    )
    up = (col > j1[:, None]) & (col < brk_up[:, None])
    dn = (col < j1[:, None]) & (col > brk_dn[:, None])
    return up, dn


def _corner_correspondences(proj, q_mask, last: PointCloud, n_query,
                            cfg: LoamConfig):
    """Sharp-corner correspondence: 1-NN in the previous less-sharp cloud
    plus the closest point on a nearby *different* ring, via the
    reference's literal break-bounded index walks
    (src/laserOdometry.cpp:474-528): upward candidates need ring > cr,
    downward ring < cr, both within the +-2.5-ring break.  Under
    cfg.emulate_upward_scan_truncation the upward walk is additionally
    cut at index n_query — the reference's loop-bound quirk
    (laserCloudCornerLast scanned with j < cornerPointsSharpNum, :486).
    """
    j1, d2 = nn.nearest_1(proj, q_mask, last.xyz, last.mask, cfg.odom_nn_gate_sq)
    ring = last.ring()
    cr = jnp.where(j1 >= 0, ring[jnp.clip(j1, 0)], -100)
    col = jnp.arange(last.capacity)[None, :]
    up, dn = _scan_bounds(col, j1, ring, cr, cfg)
    if cfg.emulate_upward_scan_truncation:
        up &= col < n_query
    cand = (
        last.mask[None, :]
        & (j1 >= 0)[:, None]
        & (
            (up & (ring[None, :] > cr[:, None]))
            | (dn & (ring[None, :] < cr[:, None]))
        )
    )
    j2, _ = nn.masked_argmin(d2, cand, cfg.odom_nn_gate_sq)
    return j1, j2


def _surf_correspondences(proj, q_mask, last: PointCloud, n_query,
                          cfg: LoamConfig):
    """Flat-surface correspondence: 1-NN, second point with ring <= cr on
    the upward walk / ring >= cr on the downward walk, third point with
    ring > cr upward / ring < cr downward — the reference's literal
    eligibility tests (src/laserOdometry.cpp:586-651).  n_query: the
    upward loop bound (surfPointsFlatNum, :598), applied under
    cfg.emulate_upward_scan_truncation."""
    j1, d2 = nn.nearest_1(proj, q_mask, last.xyz, last.mask, cfg.odom_nn_gate_sq)
    ring = last.ring()
    cr = jnp.where(j1 >= 0, ring[jnp.clip(j1, 0)], -100)
    col = jnp.arange(last.capacity)[None, :]
    up, dn = _scan_bounds(col, j1, ring, cr, cfg)
    if cfg.emulate_upward_scan_truncation:
        up &= col < n_query
    base = last.mask[None, :] & (j1 >= 0)[:, None]
    rq = ring[None, :]
    crq = cr[:, None]
    cand2 = base & ((up & (rq <= crq)) | (dn & (rq >= crq)))
    cand3 = base & ((up & (rq > crq)) | (dn & (rq < crq)))
    j2, _ = nn.masked_argmin(d2, cand2, cfg.odom_nn_gate_sq)
    j3, _ = nn.masked_argmin(d2, cand3, cfg.odom_nn_gate_sq)
    return j1, j2, j3


def _gather(cloud: PointCloud, idx):
    return cloud.xyz[jnp.clip(idx, 0), :]


# ---------------------------------------------------------------------------
# Gauss-Newton solve
# ---------------------------------------------------------------------------

def _odom_residuals(transform, it, sharp: PointCloud, flat: PointCloud,
                    corner_last: PointCloud, surf_last: PointCloud,
                    cj1, cj2, sj1, sj2, sj3, cfg: LoamConfig):
    """One linearization: project features to sweep start with the current
    transform, form weighted line/plane residuals + keep masks
    (src/laserOdometry.cpp:530-583, 653-694)."""
    late = it >= cfg.odom_weight_start_iter

    proj_c = transform_to_start(sharp.xyz, sharp.sweep_time(), transform)
    t1 = _gather(corner_last, cj1)
    t2 = _gather(corner_last, cj2)
    dir_c, d_c = residuals.point_to_line(proj_c, t1, t2)
    s_c = jnp.where(late, 1.0 - cfg.odom_weight_slope * jnp.abs(d_c), 1.0)
    keep_c = (
        (cj2 >= 0)
        & sharp.mask
        & (s_c > cfg.weight_keep_threshold)
        & (d_c != 0.0)
    )
    coeff_c = s_c[:, None] * dir_c
    rhs_c = s_c * d_c

    proj_s = transform_to_start(flat.xyz, flat.sweep_time(), transform)
    p1 = _gather(surf_last, sj1)
    p2 = _gather(surf_last, sj2)
    p3 = _gather(surf_last, sj3)
    normal, pd = residuals.plane_from_tripod(p1, p2, p3)
    d_s = residuals.point_to_plane(proj_s, normal, pd)
    range_fac = jnp.sqrt(
        jnp.sqrt(jnp.maximum(jnp.sum(proj_s * proj_s, -1), 1e-12))
    )
    s_s = jnp.where(
        late, 1.0 - cfg.odom_weight_slope * jnp.abs(d_s) / range_fac, 1.0
    )
    keep_s = (
        (sj2 >= 0)
        & (sj3 >= 0)
        & flat.mask
        & (s_s > cfg.weight_keep_threshold)
        & (d_s != 0.0)
    )
    coeff_s = s_s[:, None] * normal
    rhs_s = s_s * d_s

    points = jnp.concatenate([sharp.xyz, flat.xyz], axis=0)
    coeffs = jnp.concatenate([coeff_c, coeff_s], axis=0)
    rhs = jnp.concatenate([rhs_c, rhs_s], axis=0)
    keep = jnp.concatenate([keep_c, keep_s], axis=0)
    coeffs = jnp.where(keep[:, None], coeffs, 0.0)
    rhs = jnp.where(keep, rhs, 0.0)
    return points, coeffs, rhs, keep


def _odom_associate(transform, feats: FeatureClouds,
                    corner_last: PointCloud, surf_last: PointCloud,
                    cfg: LoamConfig):
    """One correspondence re-association at the given transform
    (src/laserOdometry.cpp:474-528,586-651)."""
    sharp, flat = feats.sharp, feats.flat
    proj_c = transform_to_start(sharp.xyz, sharp.sweep_time(), transform)
    proj_s = transform_to_start(flat.xyz, flat.sweep_time(), transform)
    if jax.default_backend() == "tpu":
        # fused streaming kernel: same break-bounded walk semantics
        # without (Q, M) HBM intermediates
        from .ops.pallas.odom_corr import odom_correspondences

        cj1, cj2 = odom_correspondences(
            proj_c, sharp.mask, corner_last.xyz, corner_last.mask,
            corner_last.ring(), sharp.count(),
            cfg.odom_nn_gate_sq, cfg.ring_window,
            cfg.emulate_upward_scan_truncation, surf=False,
        )
        sj1, sj2, sj3 = odom_correspondences(
            proj_s, flat.mask, surf_last.xyz, surf_last.mask,
            surf_last.ring(), flat.count(),
            cfg.odom_nn_gate_sq, cfg.ring_window,
            cfg.emulate_upward_scan_truncation, surf=True,
        )
    else:
        cj1, cj2 = _corner_correspondences(
            proj_c, sharp.mask, corner_last, sharp.count(), cfg
        )
        sj1, sj2, sj3 = _surf_correspondences(
            proj_s, flat.mask, surf_last, flat.count(), cfg
        )
    return cj1, cj2, sj1, sj2, sj3


def gauss_newton_odometry(transform0, feats: FeatureClouds,
                          corner_last: PointCloud, surf_last: PointCloud,
                          cfg: LoamConfig):
    """The <=25-iteration GN loop with re-association every 5 iterations,
    first-solve degeneracy projector, NaN guard, and 0.1deg/0.1cm
    convergence break (src/laserOdometry.cpp:470-827).

    Structured as a while_loop over re-association ROUNDS: each round
    re-associates once (unconditionally — exactly the reference's
    iterCount % 5 == 0 schedule, since a round starts only when not yet
    converged) and then runs `reassociate_every` solver iterations whose
    state updates are masked once convergence/iteration-cap hits.  This
    is bit-identical to a flat while_loop with a cond-gated
    re-association, but under vmap (scenario-batched replay) a batched
    lax.cond lowers to both-branches-plus-select — which would pay the
    correspondence search on EVERY iteration instead of every 5th."""
    sharp, flat = feats.sharp, feats.flat
    S, F = sharp.capacity, flat.capacity
    N = S + F

    init = dict(
        round=jnp.int32(0),
        it=jnp.int32(0),
        transform=transform0,
        converged=jnp.array(False),
        P=jnp.eye(6, dtype=jnp.float32),
        degenerate=jnp.array(False),
        have_P=jnp.array(False),
        nan_skip=jnp.int32(0),
        # row-accumulation state (cfg.odom_accumulate_rows): per-point
        # coeff outer products / coeff*rhs sums and the running row count
        # — the laserCloudOri/coeffSel append semantics of
        # src/laserOdometry.cpp:458-459,580-581,691-692
        Cacc=jnp.zeros((N, 3, 3), jnp.float32),
        bacc=jnp.zeros((N, 3), jnp.float32),
        n_rows=jnp.int32(0),
    )
    n_rounds = -(-cfg.odom_max_iters // cfg.reassociate_every)

    def iteration(c, corr):
        """One solver iteration at fixed correspondences; updates are
        masked out when already converged or past the iteration cap."""
        cj1, cj2, sj1, sj2, sj3 = corr
        transform = c["transform"]
        active = ~c["converged"] & (c["it"] < cfg.odom_max_iters)

        points, coeffs, rhs, keep = _odom_residuals(
            transform, c["it"], sharp, flat, corner_last, surf_last,
            cj1, cj2, sj1, sj2, sj3, cfg,
        )
        keep = keep & active
        coeffs = jnp.where(keep[:, None], coeffs, 0.0)
        rhs = jnp.where(keep, rhs, 0.0)
        n_sel = jnp.sum(keep.astype(jnp.int32))

        if cfg.odom_accumulate_rows:
            # append this iteration's rows to the frame-lifetime set
            # (src/laserOdometry.cpp:458-459: clear is outside the loop)
            Cacc = c["Cacc"] + coeffs[:, :, None] * coeffs[:, None, :]
            bacc = c["bacc"] + coeffs * (
                -cfg.odom_rhs_scale * rhs
            )[:, None]
            n_rows = c["n_rows"] + n_sel
            enough = n_rows >= cfg.odom_min_correspondences
            J = residuals.odom_point_jacobians(points, transform)
            ata, atb = residuals.normal_equations_accumulated(J, Cacc, bacc)
        else:
            Cacc, bacc = c["Cacc"], c["bacc"]
            n_rows = n_sel
            enough = n_sel >= cfg.odom_min_correspondences
            rows = residuals.odom_jacobian_rows(points, coeffs, transform)
            ata, atb = residuals.normal_equations(
                rows, -cfg.odom_rhs_scale * rhs, keep
            )
        x = linalg.solve_sym6(ata, atb)

        # degeneracy projector from the first solved iteration
        # (src/laserOdometry.cpp:770-797; the reference computes it
        # strictly at iterCount==0 — identical unless iter 0 lacked
        # correspondences, where the reference reuses a stale projector)
        def mk_P(_):
            return linalg.degeneracy_projector(
                ata, cfg.odom_degen_eigen_threshold
            )

        need_P = active & enough & ~c["have_P"]
        P, degenerate = jax.lax.cond(
            need_P, mk_P, lambda _: (c["P"], c["degenerate"]), None
        )
        have_P = c["have_P"] | need_P

        x = jnp.where(degenerate, P @ x, x)

        is_nan = jnp.any(jnp.isnan(x)) | jnp.any(jnp.isinf(x))
        x = jnp.where(is_nan, 0.0, x)
        do_update = active & enough & ~is_nan
        new_transform = jnp.where(do_update, transform + x, transform)

        delta_r = jnp.sqrt(jnp.sum(jnp.square(jnp.degrees(x[:3]))))
        delta_t = jnp.sqrt(jnp.sum(jnp.square(x[3:] * 100.0)))
        converged = c["converged"] | (
            do_update
            & (delta_r < cfg.odom_delta_r_break_deg)
            & (delta_t < cfg.odom_delta_t_break_cm)
        )
        act_i = active.astype(jnp.int32)
        return dict(
            round=c["round"],
            it=c["it"] + act_i,
            transform=new_transform,
            converged=converged,
            P=P,
            degenerate=degenerate,
            have_P=have_P,
            nan_skip=c["nan_skip"] + (is_nan & enough).astype(jnp.int32) * act_i,
            Cacc=Cacc,
            bacc=bacc,
            n_rows=n_rows,
        )

    def round_cond(c):
        return (c["round"] < n_rounds) & ~c["converged"]

    def round_body(c):
        corr = _odom_associate(
            c["transform"], feats, corner_last, surf_last, cfg
        )
        for _ in range(cfg.reassociate_every):
            c = iteration(c, corr)
        return dict(c, round=c["round"] + 1)

    out = jax.lax.while_loop(round_cond, round_body, init)
    return out["transform"], out["nan_skip"]


# ---------------------------------------------------------------------------
# pose accumulation + cloud handoff
# ---------------------------------------------------------------------------

def accumulate_pose(transform_sum, transform, imu: ImuTrans, cfg: LoamConfig):
    """Compose the solved frame motion onto the global odometry pose with
    the 1.05 empirical scale on ry / tz and the IMU rotation plug-in
    (src/laserOdometry.cpp:830-856)."""
    neg = jnp.stack(
        [-transform[0], -transform[1] * cfg.odom_y_scale, -transform[2]]
    )
    r_new = rotations.accumulate_rotation(transform_sum[:3], neg)
    v = jnp.stack(
        [
            transform[3] - imu.shift_from_start[0],
            transform[4] - imu.shift_from_start[1],
            transform[5] * cfg.odom_y_scale - imu.shift_from_start[2],
        ]
    )
    t_new = transform_sum[3:] - rotations.r_yxz(r_new) @ v
    r_new = rotations.plugin_imu_rotation(r_new, imu.rpy_start, imu.rpy_cur)
    return jnp.concatenate([r_new, t_new])


def _project_cloud_to_end(cloud: PointCloud, transform, imu: ImuTrans):
    xyz = transform_to_end(
        cloud.xyz,
        cloud.sweep_time(),
        transform,
        imu.rpy_start,
        imu.rpy_cur,
        imu.shift_from_start,
    )
    # TransformToEnd resets the fractional sweep time
    # (src/laserOdometry.cpp:193)
    return cloud.replace(
        xyz=jnp.where(cloud.mask[:, None], xyz, 0.0),
        rel=jnp.floor(cloud.rel),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def odometry_step(state: OdomState, feats: FeatureClouds,
                  imu: ImuTrans | None = None,
                  cfg: LoamConfig = LoamConfig()):
    """One odometry frame (the body of the main loop,
    src/laserOdometry.cpp:410-931).  Returns (new_state, OdomOutput)."""
    if imu is None:
        imu = ImuTrans.zeros()

    def init_branch(_):
        # first frame: hand the feature clouds over, seed transformSum
        # with the IMU attitude, no solve (src/laserOdometry.cpp:427-456)
        tsum = state.transform_sum.at[0].add(imu.rpy_start[0]).at[2].add(
            imu.rpy_start[2]
        )
        new_state = OdomState(
            corner_last=feats.less_sharp,
            surf_last=feats.less_flat,
            transform=state.transform,
            transform_sum=tsum,
            initialized=jnp.array(True),
            frame_count=state.frame_count,
            nan_skips=state.nan_skips,
        )
        out = OdomOutput(
            pose=tsum,
            corner_last=feats.less_sharp,
            surf_last=feats.less_flat,
            full=feats.full,
            # the init frame publishes clouds but NO odometry pose
            # (src/laserOdometry.cpp:427-456: continue before the pose
            # publish), so the mapping sync gate
            # (src/laserMapping.cpp:411-414) never fires for it
            publish_to_mapping=jnp.array(False),
        )
        return new_state, out

    def solve_branch(_):
        # IMU velocity prior on translation (src/laserOdometry.cpp:461-463)
        transform = state.transform.at[3:].add(
            -imu.velo_from_start * cfg.scan_period
        )
        n_corner = state.corner_last.count()
        n_surf = state.surf_last.count()
        can_solve = (n_corner > cfg.odom_min_corner_last) & (
            n_surf > cfg.odom_min_surf_last
        )

        transform, nan_skip = jax.lax.cond(
            can_solve,
            lambda t: gauss_newton_odometry(
                t, feats, state.corner_last, state.surf_last, cfg
            ),
            lambda t: (t, jnp.int32(0)),
            transform,
        )

        tsum = accumulate_pose(state.transform_sum, transform, imu, cfg)

        corner_next = _project_cloud_to_end(feats.less_sharp, transform, imu)
        surf_next = _project_cloud_to_end(feats.less_flat, transform, imu)

        frame_count = state.frame_count + 1
        publish = frame_count >= cfg.skip_frame_num + 1
        full_out = jax.lax.cond(
            publish,
            lambda c: _project_cloud_to_end(c, transform, imu),
            lambda c: c,
            feats.full,
        )
        frame_count = jnp.where(publish, 0, frame_count)

        new_state = OdomState(
            corner_last=corner_next,
            surf_last=surf_next,
            transform=transform,
            transform_sum=tsum,
            initialized=jnp.array(True),
            frame_count=frame_count,
            nan_skips=state.nan_skips + nan_skip,
        )
        out = OdomOutput(
            pose=tsum,
            corner_last=corner_next,
            surf_last=surf_next,
            full=full_out,
            publish_to_mapping=publish,
        )
        return new_state, out

    return jax.lax.cond(state.initialized, solve_branch, init_branch, None)
