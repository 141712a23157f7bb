"""CLI launcher (C19 equivalent) + export formats (rviz-equivalent
output surface)."""

import os
import subprocess
import sys

import numpy as np

from loam_tpu.io import export


def test_tum_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    poses = rng.normal(size=(5, 6)) * 0.1
    stamps = np.arange(5) * 0.1
    path = str(tmp_path / "traj.tum")
    export.save_trajectory_tum(path, stamps, poses)
    t, pos, quat = export.load_trajectory_tum(path)
    np.testing.assert_allclose(t, stamps, atol=1e-6)
    np.testing.assert_allclose(pos, poses[:, 3:6], atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(quat, axis=1), 1.0, atol=1e-5
    )


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    mask = rng.uniform(size=100) > 0.4
    path = str(tmp_path / "cloud.ply")
    export.save_cloud_ply(path, xyz, mask)
    back = export.load_cloud_ply(path)
    np.testing.assert_array_equal(back, xyz[mask])


def test_cli_synthetic_offline(tmp_path):
    """Full CLI smoke: synthetic replay, TUM outputs appear and parse."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # CPU-only: skip the axon plugin
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/loam_jax_cache_cpu"
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "loam_tpu", "--synthetic", "4",
         "--out-dir", out, "--ring-width", "512", "--viz"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for name in ("odom.tum", "aft_mapped.tum", "integrated.tum"):
        t, pos, _ = export.load_trajectory_tum(os.path.join(out, name))
        assert t.shape == (4,)
        assert np.isfinite(pos).all()
    # map surround (/laser_cloud_surround) + rviz-equivalent artifacts
    surround = export.load_cloud_ply(os.path.join(out, "map_surround.ply"))
    assert surround.shape[0] > 0 and np.isfinite(surround).all()
    assert os.path.getsize(os.path.join(out, "viz.png")) > 10000
    assert os.path.getsize(os.path.join(out, "viewer.html")) > 1000
