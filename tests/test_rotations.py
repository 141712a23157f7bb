"""Pin the matrix-form pose algebra to the reference's literal formulas."""

import numpy as np
import jax.numpy as jnp

from loam_tpu.utils import rotations as rot
from loam_tpu.ops import deskew
import oracles


def _rng():
    return np.random.default_rng(42)


def test_r_yxz_matches_elementary_sequence():
    rng = _rng()
    for _ in range(20):
        a = rng.uniform(-1.4, 1.4, 3).astype(np.float32)
        R = np.asarray(rot.r_yxz(jnp.asarray(a)))
        # apply to a point step by step in the pointAssociateToMap order
        p = rng.uniform(-5, 5, 3).astype(np.float32)
        x1 = np.cos(a[2]) * p[0] - np.sin(a[2]) * p[1]
        y1 = np.sin(a[2]) * p[0] + np.cos(a[2]) * p[1]
        z1 = p[2]
        y2 = np.cos(a[0]) * y1 - np.sin(a[0]) * z1
        z2 = np.sin(a[0]) * y1 + np.cos(a[0]) * z1
        x2 = x1
        out = np.array(
            [
                np.cos(a[1]) * x2 + np.sin(a[1]) * z2,
                y2,
                -np.sin(a[1]) * x2 + np.cos(a[1]) * z2,
            ]
        )
        np.testing.assert_allclose(R @ p, out, rtol=1e-5, atol=1e-5)


def test_euler_yxz_roundtrip():
    rng = _rng()
    for _ in range(50):
        a = rng.uniform(-1.4, 1.4, 3)
        R = rot.r_yxz(jnp.asarray(a))
        back = np.asarray(rot.euler_yxz(R))
        np.testing.assert_allclose(back, a, rtol=1e-5, atol=1e-6)


def test_accumulate_rotation_matches_reference():
    rng = _rng()
    for _ in range(50):
        c = rng.uniform(-1.2, 1.2, 3)
        l = rng.uniform(-1.2, 1.2, 3)
        ours = np.asarray(rot.accumulate_rotation(jnp.asarray(c), jnp.asarray(l)))
        ref = oracles.accumulate_rotation_ref(*c, *l)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_plugin_imu_rotation_matches_reference():
    rng = _rng()
    for _ in range(50):
        bc = rng.uniform(-1.0, 1.0, 3)
        bl = rng.uniform(-1.0, 1.0, 3)
        al = rng.uniform(-1.0, 1.0, 3)
        ours = np.asarray(
            rot.plugin_imu_rotation(jnp.asarray(bc), jnp.asarray(bl), jnp.asarray(al))
        )
        ref = oracles.plugin_imu_rotation_ref(*bc, *bl, *al)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_transform_associate_to_map_matches_reference():
    rng = _rng()
    for _ in range(50):
        ts = rng.uniform(-1.0, 1.0, 6)
        tb = rng.uniform(-1.0, 1.0, 6)
        ta = rng.uniform(-1.0, 1.0, 6)
        ours = np.asarray(
            rot.transform_associate_to_map(
                jnp.asarray(ts), jnp.asarray(tb), jnp.asarray(ta)
            )
        )
        ref = oracles.transform_associate_to_map_ref(ts, tb, ta)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_apply_pose_inverse_roundtrip():
    rng = _rng()
    pose = jnp.asarray(rng.uniform(-1, 1, 6))
    pts = jnp.asarray(rng.uniform(-10, 10, (32, 3)))
    world = rot.apply_pose(pose, pts)
    back = rot.apply_pose_inverse(pose, world)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_transform_to_start_matches_reference():
    rng = _rng()
    transform = rng.uniform(-0.05, 0.05, 6)
    for _ in range(20):
        p = rng.uniform(-20, 20, 3)
        ring = rng.integers(0, 16)
        t = rng.uniform(0, 0.09999)
        intensity = ring + t
        ours = np.asarray(
            deskew.transform_to_start(
                jnp.asarray(p),
                jnp.asarray(10.0 * (intensity - ring)),
                jnp.asarray(transform),
            )
        )
        ref = oracles.transform_to_start_ref(p, intensity, transform)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_transform_to_end_inverts_to_start_at_s1():
    # at s = 1 and no IMU, to_end(to_start-domain) must invert to_start
    rng = _rng()
    transform = jnp.asarray(rng.uniform(-0.05, 0.05, 6))
    pts = jnp.asarray(rng.uniform(-20, 20, (16, 3)))
    s = jnp.ones(16)
    start = deskew.transform_to_start(pts, s, transform)
    end = deskew.transform_to_end(pts, s, transform)
    np.testing.assert_allclose(np.asarray(end), np.asarray(pts), atol=1e-4)
    # and for s = 0 the start projection is the identity
    s0 = jnp.zeros(16)
    np.testing.assert_allclose(
        np.asarray(deskew.transform_to_start(pts, s0, transform)),
        np.asarray(pts),
        atol=1e-6,
    )
    del start


def test_transform_to_end_with_imu_identity():
    # zero IMU angles and shift: IMU block must be a no-op
    rng = _rng()
    transform = jnp.asarray(rng.uniform(-0.05, 0.05, 6))
    pts = jnp.asarray(rng.uniform(-20, 20, (8, 3)))
    s = jnp.asarray(rng.uniform(0, 1, 8))
    z3 = jnp.zeros(3)
    a = deskew.transform_to_end(pts, s, transform)
    b = deskew.transform_to_end(pts, s, transform, z3, z3, z3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
