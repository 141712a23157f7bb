"""HBM-resident voxel-hash map store.

TPU-native replacement for the reference's world map — 4,851 cube-indexed
pcl clouds with pointer-shuffle recentering and per-cube VoxelGrid
downsampling (C12 of SURVEY.md §2; src/laserMapping.cpp:64-91,446-614,
980-1036).  Design:

* The map is an open-addressed, set-associative hash table keyed by
  *absolute* voxel coordinates (leaf = the reference's per-cube downsample
  leaf: 0.2 m corner / 0.4 m surf).  One entry = one voxel centroid
  (sum_xyz, count) — insertion IS the downsample, matching VoxelGrid's
  one-centroid-per-voxel output.  The count is capped, turning the
  centroid into an EMA, approximating PCL's repeated re-centroiding.
* Absolute keys make the reference's six recentering while-loops
  unnecessary: the sliding 21x11x21-cube window is enforced by a
  vectorized eviction pass (drop entries whose 50 m cube leaves the
  window around the sensor cube).
* Per-frame NN search (replacing the kd-trees rebuilt at
  src/laserMapping.cpp:707-708) uses a CSR search grid over 1 m cells:
  sort live entries by cell-hash bucket once per frame, then each query
  gathers its 27-cell neighborhood — exact within the reference's 1 m^2
  5-NN gate.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .config import LoamConfig
from .ops.voxel import (
    pack_coords2,
    unpack_coords2,
    voxel_coords,
)
from .utils import rotations

EMPTY = jnp.uint32(0xFFFFFFFF)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VoxelTable:
    key_hi: jax.Array   # (T,) uint32, EMPTY when free
    key_lo: jax.Array   # (T,) uint32
    sum_xyz: jax.Array  # (T, 3) float32
    cnt: jax.Array      # (T,) float32

    @staticmethod
    def create(size: int) -> "VoxelTable":
        return VoxelTable(
            key_hi=jnp.full((size,), EMPTY, jnp.uint32),
            key_lo=jnp.zeros((size,), jnp.uint32),
            sum_xyz=jnp.zeros((size, 3), jnp.float32),
            cnt=jnp.zeros((size,), jnp.float32),
        )

    @property
    def size(self) -> int:
        return self.key_hi.shape[0]

    def live(self) -> jax.Array:
        return self.key_hi != EMPTY

    def centroids(self) -> jax.Array:
        return self.sum_xyz / jnp.maximum(self.cnt, 1.0)[:, None]

    def n_live(self) -> jax.Array:
        return jnp.sum(self.live().astype(jnp.int32))


def _hash_u32(a, b):
    """Mix two uint32 words (splitmix-style)."""
    h = a * jnp.uint32(0x9E3779B1) ^ b * jnp.uint32(0x85EBCA77)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0xC2B2AE3D)
    return h ^ (h >> 13)


# ---------------------------------------------------------------------------
# insertion
# ---------------------------------------------------------------------------

def aggregate_by_voxel(xyz, mask, leaf, out_cap):
    """Pre-aggregate a frame's points into unique voxels:
    returns (key_hi, key_lo, sum_xyz, cnt, valid) of length out_cap.

    Scatter-free: one multi-key payload sort groups each voxel's points
    contiguously, two tiny sort-compactions (ops/compact.py) give every
    segment's start/end positions, and per-voxel sums are
    inclusive-prefix-sum differences gathered at those positions.
    Coordinates are centered on their voxel corner before the cumsum so
    the prefix magnitude is bounded by N*leaf (without it a world-frame
    prefix hundreds of metres out would cost the stored sums
    ~decimetres of rounding)."""
    from .ops.compact import compact_masked

    N = xyz.shape[0]
    vox = voxel_coords(xyz, leaf)
    key_hi, key_lo = pack_coords2(vox)
    key_hi = jnp.where(mask, key_hi, EMPTY)
    hi_s, lo_s, xs, ys, zs = jax.lax.sort(
        (key_hi, key_lo, xyz[:, 0], xyz[:, 1], xyz[:, 2]),
        num_keys=2, is_stable=True,
    )
    valid_s = hi_s != EMPTY
    diff = (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
    newseg = jnp.concatenate([jnp.ones((1,), bool), diff]) & valid_s
    is_end = jnp.concatenate([diff, jnp.ones((1,), bool)]) & valid_s

    pos = jnp.arange(N, dtype=jnp.int32)
    (p0,), valid = compact_masked(newseg, (pos,), out_cap)
    (p1,), _ = compact_masked(is_end, (pos,), out_cap)
    p0 = jnp.clip(p0, 0, N - 1)
    p1 = jnp.clip(p1, 0, N - 1)
    cnts = jnp.where(valid, (p1 - p0 + 1).astype(jnp.float32), 0.0)

    corner = unpack_coords2(hi_s, lo_s).astype(xyz.dtype) * jnp.asarray(
        leaf, xyz.dtype
    )
    sxyz = jnp.stack([xs, ys, zs], -1)
    vals = jnp.where(valid_s[:, None], sxyz - corner, 0.0)
    csum = jnp.cumsum(vals, axis=0)
    sums_c = csum[p1] - csum[p0] + vals[p0]
    sums = jnp.where(
        valid[:, None], corner[p0] * cnts[:, None] + sums_c, 0.0
    )
    out_hi = jnp.where(valid, hi_s[p0], EMPTY)
    out_lo = lo_s[p0]
    return out_hi, out_lo, sums, cnts, valid


def table_insert(table: VoxelTable, key_hi, key_lo, sums, cnts, valid,
                 cfg: LoamConfig) -> VoxelTable:
    """Insert per-frame unique voxel aggregates (replaces cube insertion +
    per-cube downsample, src/laserMapping.cpp:980-1036).

    Set-associative probing with conflict-retry rounds: a claim writes the
    key, re-reads to verify ownership (last-writer-wins races lose and
    retry on the next way).  Keys are unique within a frame, so
    segment-aggregate adds never collide.
    """
    T = table.size
    ways = cfg.table_ways
    nb = T // ways
    base = (_hash_u32(key_hi, key_lo) % jnp.uint32(nb)).astype(jnp.int32) * ways

    key_hi_t = table.key_hi
    key_lo_t = table.key_lo
    sum_t = jnp.concatenate([table.sum_xyz, jnp.zeros((1, 3), jnp.float32)])
    cnt_t = jnp.concatenate([table.cnt, jnp.zeros((1,), jnp.float32)])

    pending = valid
    for _ in range(cfg.insert_rounds):
        ways_idx = base[:, None] + jnp.arange(ways)[None, :]
        t_hi = key_hi_t[ways_idx]
        t_lo = key_lo_t[ways_idx]
        match = (t_hi == key_hi[:, None]) & (t_lo == key_lo[:, None])
        empty = t_hi == EMPTY
        has_match = jnp.any(match, axis=1)
        has_empty = jnp.any(empty, axis=1)
        first_match = jnp.argmax(match, axis=1)
        first_empty = jnp.argmax(empty, axis=1)
        way = jnp.where(has_match, first_match, first_empty)
        slot = base + way
        can = pending & (has_match | has_empty)

        claim = can & ~has_match
        claim_slot = jnp.where(claim, slot, T)
        key_hi_t = jnp.concatenate([key_hi_t, EMPTY[None]]).at[claim_slot].set(
            key_hi
        )[:T]
        key_lo_t = jnp.concatenate(
            [key_lo_t, jnp.zeros((1,), jnp.uint32)]
        ).at[claim_slot].set(key_lo)[:T]

        own = (key_hi_t[jnp.clip(slot, 0, T - 1)] == key_hi) & (
            key_lo_t[jnp.clip(slot, 0, T - 1)] == key_lo
        )
        ok = can & own
        add_slot = jnp.where(ok, slot, T)
        sum_t = sum_t.at[add_slot].add(sums)
        cnt_t = cnt_t.at[add_slot].add(cnts)
        pending = pending & ~ok

    # EMA count cap (keeps new observations influential; approximates
    # VoxelGrid re-centroiding of old-centroid + new points)
    cnt_new = cnt_t[:T]
    scale = jnp.minimum(1.0, cfg.voxel_count_cap / jnp.maximum(cnt_new, 1e-6))
    return VoxelTable(
        key_hi=key_hi_t,
        key_lo=key_lo_t,
        sum_xyz=sum_t[:T] * scale[:, None],
        cnt=cnt_new * scale,
    )


# ---------------------------------------------------------------------------
# sliding-window eviction
# ---------------------------------------------------------------------------

def entry_cubes(table: VoxelTable):
    """50 m cube index of each entry's centroid:
    cube = floor((p + 25) / 50) (src/laserMapping.cpp:446-452,983-989)."""
    c = table.centroids()
    return jnp.floor((c + 25.0) / 50.0).astype(jnp.int32)


def evict_outside_window(table: VoxelTable, center_cube,
                         cfg: LoamConfig) -> VoxelTable:
    """Drop entries whose cube leaves the 21x11x21 window around the
    sensor cube — the absolute-coordinate equivalent of the reference's
    recentering shifts clearing edge cubes (src/laserMapping.cpp:454-614).
    """
    half = jnp.array(
        [cfg.grid_width // 2, cfg.grid_height // 2, cfg.grid_depth // 2],
        jnp.int32,
    )
    cubes = entry_cubes(table)
    inside = jnp.all(jnp.abs(cubes - center_cube[None, :]) <= half, axis=1)
    keep = table.live() & inside
    return VoxelTable(
        key_hi=jnp.where(keep, table.key_hi, EMPTY),
        key_lo=table.key_lo,
        sum_xyz=jnp.where(keep[:, None], table.sum_xyz, 0.0),
        cnt=jnp.where(keep, table.cnt, 0.0),
    )


# ---------------------------------------------------------------------------
# FOV culling (C13)
# ---------------------------------------------------------------------------

def local_cube_fov(center_cube, tobe, cfg: LoamConfig):
    """Which of the 5x5x5 neighbor cubes intersect the laser FOV
    (src/laserMapping.cpp:616-672): a cube is kept if any corner lies
    within 60 degrees of the sensor's horizontal plane (the check against
    the body-Y-axis point)."""
    r = cfg.local_cubes
    n = 2 * r + 1
    off = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-r, r + 1),
            jnp.arange(-r, r + 1),
            jnp.arange(-r, r + 1),
            indexing="ij",
        ),
        -1,
    ).reshape(-1, 3)  # (125, 3)
    centers = (center_cube[None, :] + off).astype(jnp.float32) * cfg.cube_size
    corner_off = jnp.stack(
        jnp.meshgrid(
            jnp.array([-1.0, 1.0]),
            jnp.array([-1.0, 1.0]),
            jnp.array([-1.0, 1.0]),
            indexing="ij",
        ),
        -1,
    ).reshape(-1, 3) * (cfg.cube_size / 2.0)
    corners = centers[:, None, :] + corner_off[None, :, :]  # (125, 8, 3)

    sensor = tobe[3:]
    y_pt = rotations.apply_pose(tobe, jnp.array([0.0, 10.0, 0.0]))
    s1 = jnp.sum((sensor[None, None] - corners) ** 2, -1)
    s2 = jnp.sum((y_pt[None, None] - corners) ** 2, -1)
    root = 10.0 * jnp.sqrt(3.0) * jnp.sqrt(s1)
    check1 = 100.0 + s1 - s2 - root
    check2 = 100.0 + s1 - s2 + root
    in_fov = jnp.any((check1 < 0.0) & (check2 > 0.0), axis=1)  # (125,)
    return in_fov.reshape(n, n, n)


# ---------------------------------------------------------------------------
# per-frame local map (compacted, for the fused exact-kNN path)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LocalMap:
    """FOV-culled 5x5x5-neighborhood map centroids, compacted into a
    fixed-capacity array — laserCloudCornerFromMap/SurfFromMap
    (src/laserMapping.cpp:674-681) as one dense block, consumed by the
    fused Pallas distance/top-k kernel (ops/pallas/knn_topk.py) instead
    of a per-frame kd-tree.

    Entries are SORTED along the dominant-extent axis (sort_axis): tile
    t of the kNN kernel then covers a contiguous coordinate interval,
    so query blocks can skip tiles entirely outside their 1 m search
    window (knn_topk.knn_points prune path) — the spatial pruning that
    replaces the kd-tree's O(log n) descent."""

    xyz: jax.Array       # (cap, 3)
    mask: jax.Array      # (cap,)
    n_local: jax.Array   # () int32 — FULL keep count (may exceed cap)
    sort_axis: jax.Array  # () int32 — axis the entries are sorted along

    def overflow(self) -> jax.Array:
        """Centroids dropped by capacity truncation (n_local beyond cap).

        The reference concatenates all 5x5x5 cube clouds unbounded
        (src/laserMapping.cpp:674-681); this compacted block caps at
        `cap` and DROPS the rest, so a nonzero overflow means the
        exact-kNN path searched an incomplete local map.  Surfaced in
        MapState.local_map_overflow so dense/long runs can detect it."""
        return jnp.maximum(self.n_local - self.mask.shape[-1], 0)


def local_map_points(table: VoxelTable, center_cube, fov, cap: int,
                     cfg: LoamConfig) -> LocalMap:
    """Compact the local-region (5x5x5 cubes, FOV-culled) centroids,
    SORTED along the dominant-extent axis.

    One lax.sort does compaction AND spatial ordering at once: the key
    is the kept entry's coordinate on the widest-spread axis (+BIG for
    dropped entries, pushing them past the tail) — same cost as the
    plain ~keep compaction sort it replaces (ops/compact.py rationale),
    but the resulting block is a sorted run the kNN kernel can window
    (see LocalMap docstring).

    n_local reports the full keep count; entries beyond `cap` are
    truncated from xyz/mask (detectable via LocalMap.overflow())."""
    cent = table.centroids()
    cubes = entry_cubes(table)
    off = cubes - center_cube[None, :]
    r = cfg.local_cubes
    in_region = table.live() & jnp.all(jnp.abs(off) <= r, axis=1)
    offc = jnp.clip(off + r, 0, 2 * r)
    fov_ok = fov[offc[:, 0], offc[:, 1], offc[:, 2]]
    keep = in_region & fov_ok

    big = jnp.float32(3.0e38)
    lo = jnp.min(jnp.where(keep[:, None], cent, big), axis=0)
    hi = jnp.max(jnp.where(keep[:, None], cent, -big), axis=0)
    axis = jnp.argmax(hi - lo).astype(jnp.int32)
    coord = jnp.take(cent, axis, axis=1)
    key = jnp.where(keep, coord, big)
    _, x, y, z = jax.lax.sort(
        (key, cent[:, 0], cent[:, 1], cent[:, 2]),
        num_keys=1, is_stable=True,
    )
    n_keep = jnp.sum(keep.astype(jnp.int32))
    ok = jnp.arange(cap) < n_keep
    T = cent.shape[0]
    if cap <= T:
        x, y, z = x[:cap], y[:cap], z[:cap]
    else:
        pad = jnp.zeros((cap - T,), x.dtype)
        x = jnp.concatenate([x, pad])
        y = jnp.concatenate([y, pad])
        z = jnp.concatenate([z, pad])
    return LocalMap(
        xyz=jnp.where(ok[:, None], jnp.stack([x, y, z], -1), 0.0),
        mask=ok,
        n_local=n_keep,
        sort_axis=axis,
    )


# ---------------------------------------------------------------------------
# per-frame search grid (CSR over 1 m cells)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SearchGrid:
    """Dense-bucketed per-frame search grid.

    Buckets are materialized as fixed-width rows so a query's 27-cell
    neighborhood gathers as 27 contiguous (cap, 3) blocks — an order of
    magnitude fewer (and wider) HBM transactions than element gathers.
    """

    xyz: jax.Array      # (B, cap, 3) bucket-major candidate coordinates
    valid: jax.Array    # (B, cap) slot validity
    n_local: jax.Array  # () int32 — live entries in the local region


def _cell_bucket(cell, n_buckets):
    h = _hash_u32(
        (cell[..., 0] * jnp.int32(73856093)).astype(jnp.uint32)
        ^ (cell[..., 1] * jnp.int32(19349663)).astype(jnp.uint32),
        (cell[..., 2] * jnp.int32(83492791)).astype(jnp.uint32),
    )
    return (h % jnp.uint32(n_buckets)).astype(jnp.int32)


def build_search_grid(table: VoxelTable, center_cube, fov, cfg: LoamConfig
                      ) -> SearchGrid:
    """Bucket the local-region (5x5x5 cubes, FOV-culled) map centroids by
    1 m cell — the per-frame analogue of the kd-tree rebuild."""
    B = cfg.search_buckets
    cent = table.centroids()
    cubes = entry_cubes(table)
    off = cubes - center_cube[None, :]
    r = cfg.local_cubes
    in_region = table.live() & jnp.all(jnp.abs(off) <= r, axis=1)
    offc = jnp.clip(off + r, 0, 2 * r)
    fov_ok = fov[offc[:, 0], offc[:, 1], offc[:, 2]]
    keep = in_region & fov_ok

    cell = jnp.floor(cent / cfg.search_cell).astype(jnp.int32)
    bucket = jnp.where(keep, _cell_bucket(cell, B), B)
    order = jnp.argsort(bucket)
    bucket_s = bucket[order]
    xyz_s = cent[order]
    starts = jnp.searchsorted(bucket_s, jnp.arange(B + 1)).astype(jnp.int32)
    cap = cfg.search_bucket_cap
    rank = jnp.arange(bucket_s.shape[0], dtype=jnp.int32) - starts[
        jnp.clip(bucket_s, 0, B)
    ]
    ok = (bucket_s < B) & (rank < cap)
    slot = jnp.where(ok, bucket_s * cap + rank, B * cap)
    dense = jnp.zeros((B * cap + 1, 3), jnp.float32).at[slot].set(xyz_s)
    dvalid = jnp.zeros((B * cap + 1,), bool).at[slot].set(ok)
    return SearchGrid(
        xyz=dense[:-1].reshape(B, cap, 3),
        valid=dvalid[:-1].reshape(B, cap),
        n_local=jnp.sum(keep.astype(jnp.int32)),
    )


def _neighbor_offsets():
    # plain numpy constant: jnp caching here would capture a tracer when
    # first called inside a traced while_loop body
    import numpy as np

    return np.stack(
        np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1], indexing="ij"), -1
    ).reshape(-1, 3).astype(np.int32)


def knn_search(grid: SearchGrid, q_xyz, q_mask, k: int, cfg: LoamConfig):
    """k-NN among the 27-cell neighborhood of each query — exact within
    the reference's 1 m^2 gate (5th-NN sq-dist < 1.0,
    src/laserMapping.cpp:717-719,824-826).

    Returns (pts (Q, k, 3), d2 (Q, k)) nearest-first.
    """
    cand, valid = knn_candidates(grid, q_xyz, q_mask, k, cfg)
    return knn_from_candidates(cand, valid, q_xyz, k)


def knn_candidates(grid: SearchGrid, q_xyz, q_mask, k: int,
                   cfg: LoamConfig):
    """Gather the k nearest 27-cell-neighborhood candidates per query.

    This is the expensive gather.  The GN solvers call it ONCE per frame
    at the motion-prior pose and re-rank the cached candidates each
    iteration (knn_from_candidates) — valid because per-iteration pose
    updates are millimetric while candidates span the full 1 m gate, so
    the cached top-k(cand) remains a superset of the true 5-NN.  (The
    reference instead re-queries its kd-trees every iteration,
    src/laserMapping.cpp:717,824.)

    Returns (cand (Q, k, 3), cand_valid (Q, k)).

    The gather intermediate is (chunk, 27*cap, 3) per scenario: queries
    are processed in cfg.knn_query_chunk chunks (lax.map) so peak HBM
    stays bounded under large scenario batches, and bucket rows are
    gathered as flattened (cap*3,) lanes so XLA lane-padding stays ~1x
    instead of 4x on the cap=32 axis.
    """
    Q = q_xyz.shape[0]
    cap = cfg.search_bucket_cap
    flat_rows = grid.xyz.reshape(grid.xyz.shape[0], cap * 3)
    offsets = jnp.asarray(_neighbor_offsets())

    def one_chunk(args):
        qx, qm = args
        c = qx.shape[0]
        cell = jnp.floor(qx / cfg.search_cell).astype(jnp.int32)
        cells = cell[:, None, :] + offsets[None, :, :]
        buckets = _cell_bucket(cells, cfg.search_buckets)  # (c, 27)
        cand = flat_rows[buckets].reshape(c, 27 * cap, 3)
        valid = grid.valid[buckets].reshape(c, 27 * cap) & qm[:, None]
        return _kselect(cand, valid, qx, k)

    chunk = cfg.knn_query_chunk
    if chunk <= 0 or Q <= chunk or Q % chunk:
        pts, d2 = one_chunk((q_xyz, q_mask))
    else:
        n = Q // chunk
        pts, d2 = jax.lax.map(
            one_chunk,
            (q_xyz.reshape(n, chunk, 3), q_mask.reshape(n, chunk)),
        )
        pts = pts.reshape(Q, k, 3)
        d2 = d2.reshape(Q, k)
    return pts, d2 < 1e29


def knn_from_candidates(cand, cand_valid, q_xyz, k: int):
    """k-NN of each query within its cached candidate set.

    cand (Q, C, 3), cand_valid (Q, C); returns (pts (Q, k, 3), d2 (Q, k))
    nearest-first."""
    return _kselect(cand, cand_valid, q_xyz, k)


def _kselect(cand, valid, q_xyz, k: int):
    """Fused distance + k-smallest selection: the Pallas kernel on TPU
    (ops/pallas/kselect.py), lax.top_k elsewhere."""
    from .ops.pallas import kselect as _ks

    if jax.default_backend() == "tpu":
        return _ks.knn_select(cand, valid, q_xyz, k)
    return _ks.knn_select_reference(cand, valid, q_xyz, k)
