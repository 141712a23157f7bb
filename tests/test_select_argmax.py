"""Parity of the fixed-trip-count argmax selection
(features.select_rings_argmax) against the candidate-walk select_ring
(which is itself pinned to the sequential reference oracle by
tests/test_features.py).  The argmax path is an alternative formulation
(config.select_argmax, off by default — the measured default is the XLA
while_loop walk, see config.py): its cost is batch-independent, so it
must label IDENTICALLY on every structure the walk can hit — ties,
suppression chains across subregion boundaries, degenerate rings,
pre-picked marks."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu.ops import features as FT

from test_select_walk import _ring_case, _xla_labels


def _cfg(W):
    return dataclasses.replace(LoamConfig(), ring_width=W)


def _argmax_labels(curv, gap, pre, n, cfg):
    lab, picked = jax.jit(
        lambda c, g, p, nn: FT.select_rings_argmax(c, g, p, nn, cfg)
    )(curv, gap, pre, n)
    return np.asarray(lab), np.asarray(picked)


def test_argmax_matches_select_ring_random():
    W = 512
    cfg = _cfg(W)
    for seed in (3, 17, 29):
        xyz, curv, gap, pre, n = _ring_case(8, W, seed=seed)
        lab_x, pick_x = _xla_labels(xyz, curv, gap, pre, n, cfg)
        lab_a, pick_a = _argmax_labels(curv, gap, pre, n, cfg)
        np.testing.assert_array_equal(lab_a, lab_x)
        np.testing.assert_array_equal(pick_a, pick_x)


def test_argmax_matches_on_ties():
    """Heavy curvature ties: the visit-order emulation (larger-index
    first descending, smaller-index first ascending) must hold."""
    W = 256
    cfg = _cfg(W)
    rng = np.random.default_rng(23)
    R = 6
    # quantize curvature to force many exact ties on both sides of the
    # 0.1 threshold
    curv = (rng.integers(0, 6, size=(R, W)) * 0.06).astype(np.float32)
    gap = rng.exponential(0.005, size=(R, W)).astype(np.float32)
    pre = rng.uniform(size=(R, W)) < 0.05
    n = np.full((R,), W, np.int32)
    xyz = np.zeros((R, W, 3), np.float32)
    lab_x, pick_x = _xla_labels(
        jnp.asarray(xyz), jnp.asarray(curv), jnp.asarray(gap),
        jnp.asarray(pre), jnp.asarray(n), cfg
    )
    lab_a, pick_a = _argmax_labels(
        jnp.asarray(curv), jnp.asarray(gap), jnp.asarray(pre),
        jnp.asarray(n), cfg
    )
    np.testing.assert_array_equal(lab_a, lab_x)
    np.testing.assert_array_equal(pick_a, pick_x)


def test_argmax_matches_degenerate_rings():
    """Short rings (n < 12), minimal rings, all-smooth and all-spiky."""
    W = 256
    cfg = _cfg(W)
    rng = np.random.default_rng(31)
    R = 6
    curv = rng.exponential(0.2, size=(R, W)).astype(np.float32)
    curv[2] = 0.01   # all below threshold
    curv[3] = 5.0    # all above threshold
    gap = rng.exponential(0.005, size=(R, W)).astype(np.float32)
    pre = np.zeros((R, W), bool)
    n = np.array([5, 13, W, W, 40, W], np.int32)
    xyz = np.zeros((R, W, 3), np.float32)
    lab_x, pick_x = _xla_labels(
        jnp.asarray(xyz), jnp.asarray(curv), jnp.asarray(gap),
        jnp.asarray(pre), jnp.asarray(n), cfg
    )
    lab_a, pick_a = _argmax_labels(
        jnp.asarray(curv), jnp.asarray(gap), jnp.asarray(pre),
        jnp.asarray(n), cfg
    )
    np.testing.assert_array_equal(lab_a, lab_x)
    np.testing.assert_array_equal(pick_a, pick_x)


def test_argmax_full_frontend_parity():
    """extract_features default (argmax) vs the select_ring path on a
    synthetic sweep."""
    from loam_tpu.io import synth
    from loam_tpu import frontend

    cfg_a = dataclasses.replace(LoamConfig(), ring_width=512)
    cfg_w = dataclasses.replace(
        LoamConfig(), ring_width=512, select_argmax=False,
        select_walk_kernel=False,
    )
    world = synth.make_world(seed=9)
    poses = synth.straight_trajectory(2, speed=1.1)
    xyz, m = synth.simulate_sweep(world, poses[0], poses[1],
                                  n_azimuth=420, seed=9)
    from loam_tpu.ops.features import extract_features

    fa = extract_features(
        frontend.ingest_sweep(jnp.asarray(xyz), jnp.asarray(m), cfg_a), cfg_a
    )
    fw = extract_features(
        frontend.ingest_sweep(jnp.asarray(xyz), jnp.asarray(m), cfg_w), cfg_w
    )
    for name in ("sharp", "less_sharp", "flat", "less_flat"):
        ca, cw = getattr(fa, name), getattr(fw, name)
        np.testing.assert_array_equal(
            np.asarray(ca.mask), np.asarray(cw.mask)
        )
        np.testing.assert_allclose(
            np.asarray(ca.xyz), np.asarray(cw.xyz), rtol=0, atol=0
        )
