"""Pallas selection-walk kernel parity: interpreter mode vs the XLA
select_ring (which is itself pinned to the sequential reference oracle
by tests/test_features.py)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu.ops import features as FT
from loam_tpu.ops.pallas import select_walk as SW


def _ring_case(R, W, seed=0, frac_valid=0.92, frac_pre=0.05):
    """Random curvature/gap rings with plausible structure: mostly smooth
    with sharp spikes, occasional big gaps, some pre-picked marks."""
    rng = np.random.default_rng(seed)
    curv = rng.exponential(0.03, size=(R, W)).astype(np.float32)
    spikes = rng.uniform(size=(R, W)) < 0.08
    curv = np.where(spikes, rng.exponential(1.5, size=(R, W)), curv)
    gap = rng.exponential(0.01, size=(R, W)).astype(np.float32)
    big = rng.uniform(size=(R, W)) < 0.04
    gap = np.where(big, rng.uniform(0.1, 2.0, size=(R, W)), gap)
    pre = rng.uniform(size=(R, W)) < frac_pre
    n = rng.integers(int(W * 0.5), W, size=(R,)).astype(np.int32)
    # a couple of degenerate rings
    if R >= 4:
        n[0] = 5       # below the >= 12 guard
        n[1] = 13      # minimal
    xyz = rng.normal(size=(R, W, 3)).astype(np.float32)
    return (jnp.asarray(xyz), jnp.asarray(curv), jnp.asarray(gap),
            jnp.asarray(pre), jnp.asarray(n))


def _cfg(W):
    return dataclasses.replace(LoamConfig(), ring_width=W)


def _xla_labels(xyz, curv, gap, pre, n, cfg):
    lab, picked = jax.vmap(
        lambda x, c, g, p, nn: FT.select_ring(x, c, g, p, nn, cfg)
    )(xyz, curv, gap, pre, n)
    return np.asarray(lab), np.asarray(picked)


def _kernel_labels(curv, gap, pre, n, cfg):
    lab, picked = FT.select_rings_walk(curv, gap, pre, n, cfg,
                                       interpret=True)
    return np.asarray(lab), np.asarray(picked)


def test_walk_kernel_matches_select_ring():
    W = 512
    cfg = _cfg(W)
    xyz, curv, gap, pre, n = _ring_case(8, W, seed=3)
    lab_x, pick_x = _xla_labels(xyz, curv, gap, pre, n, cfg)
    lab_k, pick_k = _kernel_labels(curv, gap, pre, n, cfg)
    np.testing.assert_array_equal(lab_k, lab_x)
    np.testing.assert_array_equal(pick_k, pick_x)


def test_walk_kernel_matches_on_smooth_rings():
    """All-below-threshold rings: corner walk exits immediately, flat
    quota fills from the smoothest points."""
    W = 256
    cfg = _cfg(W)
    rng = np.random.default_rng(11)
    R = 4
    curv = jnp.asarray(rng.uniform(0.0, 0.05, size=(R, W)).astype(np.float32))
    gap = jnp.asarray(rng.exponential(0.005, size=(R, W)).astype(np.float32))
    pre = jnp.zeros((R, W), bool)
    n = jnp.asarray(np.full((R,), W, np.int32))
    xyz = jnp.zeros((R, W, 3), jnp.float32)
    lab_x, pick_x = _xla_labels(xyz, curv, gap, pre, n, cfg)
    lab_k, pick_k = _kernel_labels(curv, gap, pre, n, cfg)
    np.testing.assert_array_equal(lab_k, lab_x)
    np.testing.assert_array_equal(pick_k, pick_x)


def test_walk_kernel_matches_on_spiky_rings():
    """All-above-threshold rings: corner quota + 21st-candidate stop, flat
    walk exits immediately."""
    W = 256
    cfg = _cfg(W)
    rng = np.random.default_rng(13)
    R = 4
    curv = jnp.asarray(rng.uniform(0.2, 3.0, size=(R, W)).astype(np.float32))
    gap = jnp.asarray(rng.exponential(0.005, size=(R, W)).astype(np.float32))
    pre = jnp.zeros((R, W), bool)
    n = jnp.asarray(np.full((R,), W, np.int32))
    xyz = jnp.zeros((R, W, 3), jnp.float32)
    lab_x, pick_x = _xla_labels(xyz, curv, gap, pre, n, cfg)
    lab_k, pick_k = _kernel_labels(curv, gap, pre, n, cfg)
    np.testing.assert_array_equal(lab_k, lab_x)
    np.testing.assert_array_equal(pick_k, pick_x)


def test_walk_kernel_full_frontend_parity():
    """End-to-end: extract_features with the kernel path (interpret) vs
    the XLA path on a synthetic sweep."""
    from loam_tpu.io import synth
    from loam_tpu import frontend

    cfg = dataclasses.replace(LoamConfig(), ring_width=512)
    world = synth.make_world(seed=5)
    poses = synth.straight_trajectory(2, speed=1.0)
    xyz, m = synth.simulate_sweep(world, poses[0], poses[1],
                                  n_azimuth=420, seed=5)
    sweep = frontend.ingest_sweep(jnp.asarray(xyz), jnp.asarray(m), cfg)

    counts = jnp.sum(sweep.mask.astype(jnp.int32), axis=1)
    curv, _ = jax.vmap(FT.ring_curvature)(sweep.xyz, counts)
    gap_sq = jax.vmap(FT.ring_gaps)(sweep.xyz)
    pre = jnp.zeros_like(sweep.mask)

    lab_x, _ = _xla_labels(sweep.xyz, curv, gap_sq, pre, counts, cfg)
    lab_k, _ = _kernel_labels(curv, gap_sq, pre, counts, cfg)
    np.testing.assert_array_equal(lab_k, lab_x)


def test_walk_kernel_batched_vmap_levels():
    """The round-3 bench crash: select_walk under vmap (and vmap(vmap))
    must collapse batch axes into the ring grid axis (custom_vmap rule)
    and label identically to the unbatched call."""
    W = 128
    cfg = _cfg(W)
    xyz, curv, gap, pre, n = _ring_case(4, W, seed=7)
    base_lab, base_pick = _kernel_labels(curv, gap, pre, n, cfg)

    def k_one(c, g, p, nn):
        return FT.select_rings_walk(c, g, p, nn, cfg, interpret=True)

    # single vmap: batch of 2 identical ring sets
    st = lambda a: jnp.stack([a, a])
    lab1, pick1 = jax.jit(jax.vmap(k_one))(
        st(curv), st(gap), st(pre), st(n)
    )
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(lab1[b]), base_lab)
        np.testing.assert_array_equal(np.asarray(pick1[b]), base_pick)

    # double vmap (the bench.py scenario x frame transform)
    st2 = lambda a: st(a)[None]
    lab2, pick2 = jax.jit(jax.vmap(jax.vmap(k_one)))(
        st2(curv), st2(gap), st2(pre), st2(n)
    )
    np.testing.assert_array_equal(np.asarray(lab2[0, 1]), base_lab)
    np.testing.assert_array_equal(np.asarray(pick2[0, 1]), base_pick)


def test_pack_unpack_bits_roundtrip():
    rng = np.random.default_rng(1)
    m = jnp.asarray(rng.uniform(size=(3, 128)) < 0.3)
    np.testing.assert_array_equal(
        np.asarray(SW.unpack_bits(SW.pack_bits(m), 128)), np.asarray(m)
    )
