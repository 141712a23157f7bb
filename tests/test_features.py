"""Feature extraction vs the sequential NumPy oracle on synthetic sweeps."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu import frontend
from loam_tpu.ops import features, voxel
import feature_oracle

CFG = dataclasses.replace(
    LoamConfig(),
    ring_width=1024,
    # full-depth greedy scan for exact oracle comparison
    corner_scan_k=178,
    flat_scan_k=178,
)


def _sim_sweep(seed=0):
    world = synth.make_world(seed=seed)
    pose0 = np.zeros(6)
    pose1 = np.array([0.0, 0.01, 0.0, 0.012, 0.0, 0.1])
    xyz, mask = synth.simulate_sweep(world, pose0, pose1, n_azimuth=900,
                                     seed=seed)
    return xyz, mask


def test_ingest_basic():
    xyz, mask = _sim_sweep()
    sweep = frontend.ingest_sweep(jnp.asarray(xyz), jnp.asarray(mask), CFG)
    counts = np.asarray(jnp.sum(sweep.mask, axis=1))
    # all 16 rings should be populated with most azimuth steps
    assert (counts > 700).all(), counts
    # mask must be contiguous per ring (points packed at row start)
    m = np.asarray(sweep.mask)
    for r in range(16):
        n = counts[r]
        assert m[r, :n].all() and not m[r, n:].any()
    # rel channel: integer part == ring id, fractional time in [0, scanPeriod]
    rel = np.asarray(sweep.rel)
    for r in range(16):
        n = counts[r]
        ring_ids = np.floor(rel[r, :n])
        assert (ring_ids == r).all()
        t = rel[r, :n] - r
        assert (t >= -1e-4).all() and (t <= 0.1 + 1e-4).all()
        # time within a ring must be (weakly) increasing
        assert (np.diff(t) > -1e-5).all()


def test_features_match_oracle():
    xyz, mask = _sim_sweep()
    sweep = frontend.ingest_sweep(jnp.asarray(xyz), jnp.asarray(mask), CFG)
    counts = np.asarray(jnp.sum(sweep.mask, axis=1))

    curv, _ = features.jax.vmap(features.ring_curvature)(
        sweep.xyz, jnp.asarray(counts)
    )
    pre, gap = features.jax.vmap(
        lambda x, n: features.ring_prefilter(x, n, CFG)
    )(sweep.xyz, jnp.asarray(counts))
    labels, _ = features.jax.vmap(
        lambda x, c, g, p, n: features.select_ring(x, c, g, p, n, CFG)
    )(sweep.xyz, curv, gap, pre, jnp.asarray(counts))
    labels = np.asarray(labels)

    sx = np.asarray(sweep.xyz)
    curv_np = np.asarray(curv)
    mismatches = 0
    total_feats = 0
    for r in range(16):
        # inject the production curvature: pins the greedy/suppression
        # semantics independent of float accumulation order
        ref_labels, _ = feature_oracle.extract_ring_labels(
            sx[r], int(counts[r]), CFG, curv=curv_np[r].astype(np.float64)
        )
        total_feats += int((ref_labels != 0).sum())
        mismatches += int((ref_labels != labels[r]).sum())
    assert total_feats > 200, total_feats
    assert mismatches == 0, (mismatches, total_feats)
    # curvature numerics: cumsum window vs direct sum within tolerance
    for r in range(0, 16, 5):
        n = int(counts[r])
        for i in range(5, n - 5, 37):
            d = sx[r][i - 5 : i + 6].sum(axis=0) - 11.0 * sx[r][i]
            np.testing.assert_allclose(
                curv_np[r][i], float(d @ d), rtol=1e-3, atol=1e-4
            )


def test_extract_features_shapes_and_quotas():
    xyz, mask = _sim_sweep(seed=3)
    sweep = frontend.ingest_sweep(jnp.asarray(xyz), jnp.asarray(mask), CFG)
    fc = features.extract_features(sweep, CFG)
    n_sharp = int(fc.sharp.count())
    n_ls = int(fc.less_sharp.count())
    n_flat = int(fc.flat.count())
    n_lf = int(fc.less_flat.count())
    assert 0 < n_sharp <= 16 * 6 * 2
    assert n_sharp <= n_ls <= 16 * 6 * 20
    assert 0 < n_flat <= 16 * 6 * 4
    assert n_lf > 1000  # plenty of surface points
    # sharp ⊂ less_sharp by construction: every sharp xyz appears in less
    sharp_xyz = np.asarray(fc.sharp.xyz)[np.asarray(fc.sharp.mask)]
    ls_xyz = np.asarray(fc.less_sharp.xyz)[np.asarray(fc.less_sharp.mask)]
    for p in sharp_xyz[:20]:
        d = np.min(np.sum((ls_xyz - p) ** 2, axis=1))
        assert d < 1e-10


def test_voxel_downsample_centroids():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, bool)
    mask[400:] = False
    out_xyz, _, out_mask = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.asarray(mask), 0.5, 1024
    )
    out_xyz = np.asarray(out_xyz)[np.asarray(out_mask)]
    # numpy reference: group by floor(p/leaf)
    keys = np.floor(pts[:400] / 0.5).astype(int)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    cents = np.zeros((len(uniq), 3))
    for i in range(len(uniq)):
        cents[i] = pts[:400][inv == i].mean(axis=0)
    assert out_xyz.shape[0] == len(uniq)
    # match as sets
    d = np.linalg.norm(out_xyz[:, None, :] - cents[None, :, :], axis=2)
    assert d.min(axis=1).max() < 1e-5
