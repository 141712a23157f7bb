"""Voxel-hash map store: insertion, eviction, and exact gated k-NN."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu import map_store

CFG = dataclasses.replace(
    LoamConfig(),
    corner_table_size=1 << 12,
    surf_table_size=1 << 12,
    search_buckets=1 << 10,
)


def _insert_points(table, pts, leaf, cfg):
    pts = jnp.asarray(pts, jnp.float32)
    mask = jnp.ones(pts.shape[0], bool)
    hi, lo, sums, cnts, valid = map_store.aggregate_by_voxel(
        pts, mask, leaf, pts.shape[0]
    )
    return map_store.table_insert(table, hi, lo, sums, cnts, valid, cfg)


def test_insert_and_centroids():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (600, 3)).astype(np.float32)
    table = map_store.VoxelTable.create(CFG.corner_table_size)
    table = _insert_points(table, pts, 0.2, CFG)
    # number of live entries == unique voxels (no drops at this load)
    keys = np.unique(np.floor(pts / 0.2).astype(int), axis=0)
    assert int(table.n_live()) == len(keys)
    # centroids match a dict-based reference
    cents = np.asarray(table.centroids())[np.asarray(table.live())]
    ref = {}
    for p in pts:
        k = tuple(np.floor(p / 0.2).astype(int))
        ref.setdefault(k, []).append(p)
    refc = np.array([np.mean(v, axis=0) for v in ref.values()])
    d = np.linalg.norm(cents[:, None] - refc[None], axis=2)
    assert d.min(axis=1).max() < 1e-4


def test_insert_accumulates_across_frames():
    table = map_store.VoxelTable.create(CFG.corner_table_size)
    # same voxel observed in two frames: centroid averages
    table = _insert_points(table, np.array([[0.05, 0.05, 0.05]]), 0.2, CFG)
    table = _insert_points(table, np.array([[0.15, 0.15, 0.15]]), 0.2, CFG)
    assert int(table.n_live()) == 1
    c = np.asarray(table.centroids())[np.asarray(table.live())][0]
    np.testing.assert_allclose(c, [0.1, 0.1, 0.1], atol=1e-5)


def test_eviction_window():
    table = map_store.VoxelTable.create(CFG.corner_table_size)
    near = np.array([[1.0, 1.0, 1.0]])
    far = np.array([[900.0, 0.0, 0.0]])  # 18 cubes away in x: outside +-10
    table = _insert_points(table, np.concatenate([near, far]), 0.2, CFG)
    assert int(table.n_live()) == 2
    center = jnp.zeros(3, jnp.int32)
    table = map_store.evict_outside_window(table, center, CFG)
    assert int(table.n_live()) == 1
    c = np.asarray(table.centroids())[np.asarray(table.live())][0]
    np.testing.assert_allclose(c, near[0], atol=1e-4)


def test_knn_search_exact_within_gate():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-8, 8, (800, 3)).astype(np.float32)
    table = map_store.VoxelTable.create(CFG.surf_table_size)
    table = _insert_points(table, pts, 0.05, CFG)  # tiny leaf: ~1 pt/voxel
    cents = np.asarray(table.centroids())
    live = np.asarray(table.live())
    map_pts = cents[live]

    center = jnp.zeros(3, jnp.int32)
    fov = jnp.ones((5, 5, 5), bool)  # no culling in this test
    grid = map_store.build_search_grid(table, center, fov, CFG)
    assert int(grid.n_local) == len(map_pts)

    queries = rng.uniform(-6, 6, (64, 3)).astype(np.float32)
    got_pts, got_d2 = map_store.knn_search(
        grid, jnp.asarray(queries), jnp.ones(64, bool), 5, CFG
    )
    got_pts = np.asarray(got_pts)
    got_d2 = np.asarray(got_d2)
    for i, q in enumerate(queries):
        d2 = np.sum((map_pts - q) ** 2, axis=1)
        order = np.argsort(d2)
        ref5 = d2[order[:5]]
        if ref5[4] < CFG.map_nn_gate_sq:
            # inside the gate the search must be exact
            np.testing.assert_allclose(
                np.sort(got_d2[i]), ref5, rtol=1e-4, atol=1e-5
            )


def test_fov_culling():
    # cubes behind the sensor's vertical axis cone are kept; straight
    # up/down cubes (outside the 60-degree band) are culled
    tobe = jnp.zeros(6)
    center = jnp.zeros(3, jnp.int32)
    fov = np.asarray(map_store.local_cube_fov(center, tobe, CFG))
    assert fov[2, 2, 2]  # own cube always has corners in the band
    assert fov[2, 2, 4] and fov[2, 2, 0]  # ahead/behind horizontally
    assert fov[0, 2, 2] and fov[4, 2, 2]  # left/right


def test_local_map_overflow_detectable():
    # more in-region centroids than cap: mask saturates at cap, n_local
    # reports the full keep count, overflow() exposes the drop (advisor
    # round 2: truncation must not be silent)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-5, 5, (600, 3)).astype(np.float32)
    table = map_store.VoxelTable.create(CFG.corner_table_size)
    table = _insert_points(table, pts, 0.2, CFG)
    n_live = int(table.n_live())
    tobe = jnp.zeros(6)
    center = jnp.zeros(3, jnp.int32)
    fov = map_store.local_cube_fov(center, tobe, CFG)
    fov = jnp.ones_like(fov)  # isolate capacity behavior from culling

    cap = 128
    small = map_store.local_map_points(table, center, fov, cap, CFG)
    assert int(small.n_local) == n_live
    assert int(jnp.sum(small.mask)) == cap
    assert int(small.overflow()) == n_live - cap

    big = map_store.local_map_points(table, center, fov, 1024, CFG)
    assert int(big.overflow()) == 0
    assert int(jnp.sum(big.mask)) == n_live
