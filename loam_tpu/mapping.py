"""Scan-to-map refinement: components C13-C17 of SURVEY.md §2
(src/laserMapping.cpp).

One pure function ``mapping_step`` replaces the 100 Hz polling node:
motion-prior composition, sliding-window eviction, FOV-culled local search
grid, 5-NN line/plane correspondence with eigen line fits and plane
validity, full-step Gauss-Newton (threshold-100 degeneracy projector),
pose update, and voxel-hash map insertion.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .config import LoamConfig
from .types import ImuTrans, PointCloud
from . import map_store
from .ops import residuals
from .ops.voxel import voxel_downsample
from .utils import linalg, rotations


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MapState:
    corner_map: map_store.VoxelTable
    surf_map: map_store.VoxelTable
    transform_bef: jax.Array   # (6,) odometry pose at last mapping frame
    transform_aft: jax.Array   # (6,) mapped pose at last mapping frame
    nan_skips: jax.Array       # () int32
    # running count of local-map centroids dropped by the exact-kNN
    # compaction caps (LocalMap.overflow()); nonzero = the solve matched
    # against an incomplete local map, raise max_{corner,surf}_from_map
    local_map_overflow: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.array(0, jnp.int32)
    )

    @staticmethod
    def create(cfg: LoamConfig) -> "MapState":
        return MapState(
            corner_map=map_store.VoxelTable.create(cfg.corner_table_size),
            surf_map=map_store.VoxelTable.create(cfg.surf_table_size),
            transform_bef=jnp.zeros(6, jnp.float32),
            transform_aft=jnp.zeros(6, jnp.float32),
            nan_skips=jnp.array(0, jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MapOutput:
    pose_aft: jax.Array   # (6,) /aft_mapped_to_init equivalent
    pose_bef: jax.Array   # (6,) the twist-smuggled transformBefMapped
    solved: jax.Array     # () bool — local map was large enough to match
    # /velodyne_cloud_registered equivalent: the full-res sweep projected
    # into the map frame with the refined pose
    # (src/laserMapping.cpp:1060-1069); empty-masked unless a full cloud
    # was passed to mapping_step.
    registered: PointCloud | None = None


# ---------------------------------------------------------------------------
# correspondence
# ---------------------------------------------------------------------------

def _corner_map_residuals(nn_fn, q_body, q_mask, tobe, cfg: LoamConfig):
    """Corner scan-to-map residual: 5-NN (gate 1 m^2), 3x3 covariance
    eigendecomposition, line residual against centroid +- 0.1*eigvec if
    lambda1 > 3*lambda2, weight s = 1 - 0.9|d|
    (src/laserMapping.cpp:714-819).  nn_fn(q) -> (pts, d2) supplies the
    5-NN (exact fused kernel, or the cached candidate re-rank)."""
    q = rotations.apply_pose(tobe, q_body)
    pts, d2 = nn_fn(q)
    gate = q_mask & (d2[:, cfg.map_knn - 1] < cfg.map_nn_gate_sq)

    centroid = jnp.mean(pts, axis=1)
    centered = pts - centroid[:, None, :]
    cov = jnp.einsum("qki,qkj->qij", centered, centered) / cfg.map_knn
    w, V = linalg.eigh3x3(cov)
    is_line = gate & (w[:, 0] > cfg.map_line_eigen_ratio * w[:, 1])

    v1 = V[:, 0, :]
    p1 = centroid + cfg.map_line_halflength * v1
    p2 = centroid - cfg.map_line_halflength * v1
    direction, d = residuals.point_to_line(q, p1, p2)
    s = 1.0 - cfg.map_weight_slope * jnp.abs(d)
    keep = is_line & (s > cfg.weight_keep_threshold)
    coeff = jnp.where(keep[:, None], s[:, None] * direction, 0.0)
    rhs = jnp.where(keep, s * d, 0.0)
    return coeff, rhs, keep


def _surf_map_residuals(nn_fn, q_body, q_mask, tobe, cfg: LoamConfig):
    """Surface scan-to-map residual: 5-NN (gate 1 m^2), least-squares
    plane fit (A x = -1), 0.2 m off-plane validity check, range-scaled
    weight (src/laserMapping.cpp:821-877)."""
    q = rotations.apply_pose(tobe, q_body)
    pts, d2 = nn_fn(q)
    gate = q_mask & (d2[:, cfg.map_knn - 1] < cfg.map_nn_gate_sq)

    normal, pd = linalg.fit_plane5(pts)
    off = jnp.abs(
        jnp.einsum("qki,qi->qk", pts, normal) + pd[:, None]
    )
    plane_valid = jnp.all(off <= cfg.map_plane_tolerance, axis=1)

    d = residuals.point_to_plane(q, normal, pd)
    range_fac = jnp.sqrt(jnp.sqrt(jnp.maximum(jnp.sum(q * q, -1), 1e-12)))
    s = 1.0 - cfg.map_weight_slope * jnp.abs(d) / range_fac
    keep = gate & plane_valid & (s > cfg.weight_keep_threshold)
    coeff = jnp.where(keep[:, None], s[:, None] * normal, 0.0)
    rhs = jnp.where(keep, s * d, 0.0)
    return coeff, rhs, keep


def _exact_nn_fns(corner_local, surf_local, cfg: LoamConfig,
                  n_q_corner=None, n_q_surf=None, k: int | None = None):
    """Per-iteration exact k-NN against the compacted local map — the
    reference's kd re-query semantics (src/laserMapping.cpp:717,824) via
    the fused Pallas distance/top-k kernel.  n_q_*: live counts of the
    (front-compacted) query stacks — lets the kernel skip dead query
    blocks on top of dead reference tiles.

    cfg.map_knn_prune additionally windows each query block to the
    reference tiles within the search-window radius on the local map's
    sort axis — exact within the caller's distance gate, since hidden
    neighbors are exactly those the gate rejects.  The window widens
    when k > map_knn (the candidate-cache gather): cached neighbors up
    to ~2x the gate still participate in later re-rank iterations."""
    from .ops.pallas.knn_topk import knn_points

    if k is None:
        k = cfg.map_knn
    window = None
    if cfg.map_knn_prune:
        window = float(cfg.map_nn_gate_sq) ** 0.5
        if k > cfg.map_knn:
            window *= 2.0

    def nn_c(q):
        return knn_points(
            q, None, corner_local.xyz, corner_local.mask, k,
            n_q=n_q_corner,
            prune_axis=corner_local.sort_axis if cfg.map_knn_prune
            else None,
            prune_window=window,
        )

    def nn_s(q):
        return knn_points(
            q, None, surf_local.xyz, surf_local.mask, k,
            n_q=n_q_surf,
            prune_axis=surf_local.sort_axis if cfg.map_knn_prune
            else None,
            prune_window=window,
        )

    return nn_c, nn_s


def _map_iteration(c, nn_c, nn_s, corner_stack: PointCloud,
                   surf_stack: PointCloud, cfg: LoamConfig):
    """One mapping GN iteration (fresh rows each iteration — the
    reference clears laserCloudOri/coeffSel inside the loop,
    src/laserMapping.cpp:712-713).  State updates are masked once
    convergence / the iteration cap hits, so the iteration can run
    inside a statically-unrolled round."""
    tobe = c["tobe"]
    active = ~c["converged"] & (c["it"] < cfg.map_max_iters)

    coeff_c, rhs_c, keep_c = _corner_map_residuals(
        nn_c, corner_stack.xyz, corner_stack.mask, tobe, cfg
    )
    coeff_s, rhs_s, keep_s = _surf_map_residuals(
        nn_s, surf_stack.xyz, surf_stack.mask, tobe, cfg
    )
    points = jnp.concatenate([corner_stack.xyz, surf_stack.xyz])
    coeffs = jnp.concatenate([coeff_c, coeff_s])
    rhs = jnp.concatenate([rhs_c, rhs_s])
    keep = jnp.concatenate([keep_c, keep_s])
    n_sel = jnp.sum(keep.astype(jnp.int32))
    enough = n_sel >= cfg.map_min_correspondences

    rows = residuals.map_jacobian_rows(points, coeffs, tobe)
    ata, atb = residuals.normal_equations(rows, -rhs, keep)
    x = linalg.solve_sym6(ata, atb)

    def mk_P(_):
        return linalg.degeneracy_projector(
            ata, cfg.map_degen_eigen_threshold
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
    new_tobe = jnp.where(do_update, tobe + x, tobe)

    delta_r = jnp.sqrt(jnp.sum(jnp.square(jnp.degrees(x[:3]))))
    delta_t = jnp.sqrt(jnp.sum(jnp.square(x[3:] * 100.0)))
    converged = c["converged"] | (
        do_update
        & (delta_r < cfg.map_delta_r_break_deg)
        & (delta_t < cfg.map_delta_t_break_cm)
    )
    act_i = active.astype(jnp.int32)
    return dict(
        c,
        it=c["it"] + act_i,
        tobe=new_tobe,
        converged=converged,
        P=P,
        degenerate=degenerate,
        have_P=have_P,
        nan_skip=c["nan_skip"] + (is_nan & enough).astype(jnp.int32) * act_i,
    )


def _sort_stack_axis(stack: PointCloud, pose, axis) -> PointCloud:
    """Sort a front-compacted stack by its world coordinate (at `pose`)
    on `axis` — makes each tq-block of queries a thin slab on the local
    map's sort axis, so the pruned kNN kernel's per-block reference-tile
    windows are narrow.  Pure reordering: GN normal equations sum over
    rows, so the solve is order-invariant (up to float associativity),
    and front-compaction is preserved (invalid rows key to +BIG)."""
    world = rotations.apply_pose(pose, stack.xyz)
    coord = jnp.take(world, axis, axis=1)
    key = jnp.where(stack.mask, coord, jnp.float32(3.0e38))
    _, x, y, z, rel, m = jax.lax.sort(
        (key, stack.xyz[:, 0], stack.xyz[:, 1], stack.xyz[:, 2],
         stack.rel, stack.mask.astype(jnp.int32)),
        num_keys=1, is_stable=True,
    )
    return PointCloud(
        xyz=jnp.stack([x, y, z], -1), rel=rel, mask=m.astype(bool)
    )


def gauss_newton_mapping(tobe0, corner_index, surf_index,
                         corner_stack: PointCloud, surf_stack: PointCloud,
                         cfg: LoamConfig):
    """<=10 full-step GN iterations with per-iteration re-association,
    min-50-correspondence gate, threshold-100 degeneracy projector, and
    0.05deg/0.05cm convergence (src/laserMapping.cpp:710-975).

    cfg.map_exact_knn: corner_index/surf_index are map_store.LocalMap
    blocks and every iteration re-queries exact 5-NN (fused kernel) —
    the reference's kd semantics.  Otherwise they are
    map_store.SearchGrid bucket grids, and the loop runs as re-gather
    ROUNDS: each round gathers 27-cell candidates at the current pose
    (unconditionally — vmap-friendly, no batched cond) and then runs
    `map_regather_every` masked iterations re-ranking that cache; an
    optional drift-triggered re-gather (cfg.knn_regather_drift) guards
    against a bad motion prior inside a round."""
    init = dict(
        it=jnp.int32(0),
        tobe=tobe0,
        converged=jnp.array(False),
        P=jnp.eye(6, dtype=jnp.float32),
        degenerate=jnp.array(False),
        have_P=jnp.array(False),
        nan_skip=jnp.int32(0),
    )

    def nn_fns(cache):
        cand_c, valid_c, cand_s, valid_s = cache

        def nn_c(q):
            return map_store.knn_from_candidates(
                cand_c, valid_c, q, cfg.map_knn
            )

        def nn_s(q):
            return map_store.knn_from_candidates(
                cand_s, valid_s, q, cfg.map_knn
            )

        return nn_c, nn_s

    def rounds_loop(gather, every):
        """Cached-candidate GN rounds: gather once per round at the
        current pose, run `every` masked iterations re-ranking the
        cache, with the drift-triggered mid-round re-gather
        (cfg.knn_regather_drift) guarding against a bad motion prior."""
        n_rounds = -(-cfg.map_max_iters // every)

        def round_cond(c):
            return (c["round"] < n_rounds) & ~c["converged"]

        def round_body(c):
            cache = gather(c["tobe"])
            gather_pose = c["tobe"]
            for _ in range(every):
                if cfg.knn_regather_drift > 0:
                    # drift fallback inside the round: if the iterate
                    # has moved beyond the cached set's validity
                    # envelope (e.g. after a bad motion prior),
                    # re-gather at the current pose
                    # (src/laserMapping.cpp:717,824 semantics)
                    drift = jnp.linalg.norm(
                        c["tobe"][3:] - gather_pose[3:]
                    )

                    def regather(_):
                        return (c["tobe"],) + gather(c["tobe"])

                    def keep_cache(_):
                        return (gather_pose,) + cache

                    gather_pose, *cache = jax.lax.cond(
                        drift > cfg.knn_regather_drift, regather,
                        keep_cache, None,
                    )
                    cache = tuple(cache)
                nn_c, nn_s = nn_fns(cache)
                c = _map_iteration(
                    c, nn_c, nn_s, corner_stack, surf_stack, cfg
                )
            return dict(c, round=c["round"] + 1)

        out = jax.lax.while_loop(
            round_cond, round_body, dict(init, round=jnp.int32(0))
        )
        return out["tobe"], out["nan_skip"]

    if cfg.map_exact_knn:
        if cfg.map_knn_prune:
            # query blocks become thin slabs on the map's sort axis at
            # the motion-prior pose (per-iteration updates are
            # millimetric, so slabs stay thin through the solve)
            corner_stack = _sort_stack_axis(
                corner_stack, tobe0, corner_index.sort_axis
            )
            surf_stack = _sort_stack_axis(
                surf_stack, tobe0, surf_index.sort_axis
            )
        n_qc = jnp.sum(corner_stack.mask.astype(jnp.int32))
        n_qs = jnp.sum(surf_stack.mask.astype(jnp.int32))

        every = max(1, cfg.map_exact_regather_every)
        if every <= 1:
            # strict reference semantics: exact 5-NN re-query EVERY
            # iteration (src/laserMapping.cpp:717,824)
            nn_c0, nn_s0 = _exact_nn_fns(
                corner_index, surf_index, cfg, n_qc, n_qs
            )

            def cond(c):
                return (c["it"] < cfg.map_max_iters) & ~c["converged"]

            def body(c):
                return _map_iteration(
                    c, nn_c0, nn_s0, corner_stack, surf_stack, cfg
                )

            out = jax.lax.while_loop(cond, body, init)
            return out["tobe"], out["nan_skip"]

        # hybrid: the fused exact kernel gathers top-map_exact_cache_k
        # candidates once per round; iterations re-rank that cache with
        # the (Q, k)-shaped kselect kernel.  Per-iteration pose updates
        # are millimetric while the cache spans ~2x the 1 m gate, so the
        # cached top-k(cand) stays a superset of the true gated 5-NN;
        # the drift trigger re-gathers if a bad prior violates that.
        kc = max(cfg.map_exact_cache_k, cfg.map_knn)
        nn_cg, nn_sg = _exact_nn_fns(
            corner_index, surf_index, cfg, n_qc, n_qs, k=kc
        )

        def gather_exact(pose):
            qc = rotations.apply_pose(pose, corner_stack.xyz)
            cand_c, d2c = nn_cg(qc)
            qs = rotations.apply_pose(pose, surf_stack.xyz)
            cand_s, d2s = nn_sg(qs)
            return cand_c, d2c < 1e28, cand_s, d2s < 1e28

        return rounds_loop(gather_exact, every)

    # ---- cached-candidate (cell-bucket) mode ------------------------------
    def gather_cells(pose):
        qc = rotations.apply_pose(pose, corner_stack.xyz)
        cand_c, valid_c = map_store.knn_candidates(
            corner_index, qc, corner_stack.mask, cfg.knn_candidates, cfg
        )
        qs = rotations.apply_pose(pose, surf_stack.xyz)
        cand_s, valid_s = map_store.knn_candidates(
            surf_index, qs, surf_stack.mask, cfg.knn_candidates, cfg
        )
        return cand_c, valid_c, cand_s, valid_s

    return rounds_loop(gather_cells, max(1, cfg.map_regather_every))


# ---------------------------------------------------------------------------
# the mapping frame
# ---------------------------------------------------------------------------

def _downsample_cloud(cloud: PointCloud, leaf, cap):
    xyz, rel, m = voxel_downsample(cloud.xyz, cloud.mask, leaf, cap,
                                   extra=cloud.rel)
    return PointCloud(xyz=xyz, rel=rel, mask=m)


@functools.partial(jax.jit, static_argnames=("cfg",))
def mapping_step(state: MapState, pose_sum, corner_last: PointCloud,
                 surf_last: PointCloud,
                 imu_rpy: jax.Array | None = None,
                 cfg: LoamConfig = LoamConfig(),
                 full: PointCloud | None = None):
    """One mapping frame (src/laserMapping.cpp:408-1096).

    pose_sum: the odometry pose /laser_odom_to_init for this frame.
    corner_last/surf_last: the odometry's end-projected feature clouds.
    imu_rpy: optional (2,) [pitch, roll] for the 0.998/0.002 blend —
    per the reference, the IMU stream interpolated at
    timeLaserOdometry + scanPeriod (src/laserMapping.cpp:203-222), i.e.
    the sweep-END timestamp, not the sweep's last-point state.
    full: optional full-res sweep (the odometry's end-projected
    /velodyne_cloud_3); when given, MapOutput.registered carries it
    projected into the map frame with the refined pose
    (src/laserMapping.cpp:1060-1069).
    Returns (new_state, MapOutput).
    """
    # motion prior: re-apply the last mapping correction to the new
    # odometry pose (src/laserMapping.cpp:110-197,422)
    tobe = rotations.transform_associate_to_map(
        pose_sum, state.transform_bef, state.transform_aft
    )

    # incoming stacks, downsampled in body frame
    # (src/laserMapping.cpp:693-701)
    corner_stack = _downsample_cloud(
        corner_last, cfg.map_corner_leaf, cfg.max_corner_stack
    )
    surf_stack = _downsample_cloud(
        surf_last, cfg.map_surf_leaf, cfg.max_surf_stack
    )

    center_cube = jnp.floor((tobe[3:] + 25.0) / 50.0).astype(jnp.int32)

    corner_map = map_store.evict_outside_window(
        state.corner_map, center_cube, cfg
    )
    surf_map = map_store.evict_outside_window(state.surf_map, center_cube, cfg)

    fov = map_store.local_cube_fov(center_cube, tobe, cfg)
    if cfg.map_exact_knn:
        corner_index = map_store.local_map_points(
            corner_map, center_cube, fov, cfg.max_corner_from_map, cfg
        )
        surf_index = map_store.local_map_points(
            surf_map, center_cube, fov, cfg.max_surf_from_map, cfg
        )
        overflow = corner_index.overflow() + surf_index.overflow()
    else:
        overflow = jnp.int32(0)
        corner_index = map_store.build_search_grid(
            corner_map, center_cube, fov, cfg
        )
        surf_index = map_store.build_search_grid(
            surf_map, center_cube, fov, cfg
        )

    can_solve = (corner_index.n_local > cfg.map_min_corner_from_map) & (
        surf_index.n_local > cfg.map_min_surf_from_map
    )
    tobe, nan_skip = jax.lax.cond(
        can_solve,
        lambda t: gauss_newton_mapping(
            t, corner_index, surf_index, corner_stack, surf_stack, cfg
        ),
        lambda t: (t, jnp.int32(0)),
        tobe,
    )

    # transformUpdate: optional IMU roll/pitch blend, record bef/aft pair.
    # The reference calls transformUpdate ONLY when the local map was big
    # enough to solve (src/laserMapping.cpp:706,977-978): on unsolved
    # frames the blend is skipped and bef/aft keep their old values, while
    # insertion still proceeds with the prior pose.
    if imu_rpy is not None:
        blended = tobe.at[0].set(
            (1.0 - cfg.imu_blend) * tobe[0] + cfg.imu_blend * imu_rpy[0]
        )
        blended = blended.at[2].set(
            (1.0 - cfg.imu_blend) * tobe[2] + cfg.imu_blend * imu_rpy[1]
        )
        # optional third element: validity flag (0/1) — the reference's
        # imuPointerLast >= 0 guard (src/laserMapping.cpp:201)
        ok = imu_rpy[2] > 0.5 if imu_rpy.shape[0] > 2 else jnp.bool_(True)
        tobe = jnp.where(can_solve & ok, blended, tobe)

    # insert the stacks with the refined pose
    # (src/laserMapping.cpp:980-1036)
    def insert(table, stack, leaf, agg_cap):
        world = rotations.apply_pose(tobe, stack.xyz)
        hi, lo, sums, cnts, valid = map_store.aggregate_by_voxel(
            world, stack.mask, leaf, agg_cap
        )
        return map_store.table_insert(table, hi, lo, sums, cnts, valid, cfg)

    corner_map = insert(
        corner_map, corner_stack, cfg.map_corner_leaf, cfg.max_corner_stack
    )
    surf_map = insert(
        surf_map, surf_stack, cfg.map_surf_leaf, cfg.max_surf_stack
    )

    # registered full-res cloud (src/laserMapping.cpp:1060-1069)
    registered = None
    if full is not None:
        reg_xyz = rotations.apply_pose(tobe, full.xyz)
        registered = full.replace(
            xyz=jnp.where(full.mask[:, None], reg_xyz, 0.0)
        )

    new_bef = jnp.where(can_solve, pose_sum, state.transform_bef)
    new_aft = jnp.where(can_solve, tobe, state.transform_aft)
    new_state = MapState(
        corner_map=corner_map,
        surf_map=surf_map,
        transform_bef=new_bef,
        transform_aft=new_aft,
        nan_skips=state.nan_skips + nan_skip,
        local_map_overflow=state.local_map_overflow + overflow,
    )
    # the published pose pair is the post-gate transformAftMapped /
    # transformBefMapped (src/laserMapping.cpp:1071-1087) — stale when the
    # frame did not solve, exactly like the reference
    return new_state, MapOutput(
        pose_aft=new_aft, pose_bef=new_bef, solved=can_solve,
        registered=registered,
    )


def surround_cloud(state: MapState, cap: int = 65536):
    """The ~1 Hz map visualization cloud (/laser_cloud_surround,
    src/laserMapping.cpp:1038-1058): all live map centroids, compacted."""
    def extract(table, n):
        live = table.live()
        order = jnp.argsort(~live)[:n]
        return table.centroids()[order], live[order]

    cx, cm = extract(state.corner_map, cap // 4)
    sx, sm = extract(state.surf_map, cap - cap // 4)
    xyz = jnp.concatenate([cx, sx])
    mask = jnp.concatenate([cm, sm])
    return PointCloud(xyz=xyz, rel=jnp.zeros(xyz.shape[0]), mask=mask)
