"""--golden-compare: the one-command real-bag north-star harness
(BASELINE.md gate; reference README.md:22-35 bag-replay workflow).

Given any bag, `python -m loam_tpu --bag X --golden-compare` must
produce BOTH trajectory sets (TPU pipeline + the tests/golden NumPy
oracle) and the ATE verdict line.  Smoke-tested on a synthetic bag
written with test_rosbag's dependency-free writer, since no real bags
exist in this container."""

import json
import os
import subprocess
import sys

import numpy as np

import test_rosbag as trb

from loam_tpu.io import export, synth


def _write_synth_bag(path, F=4, n_azimuth=300, seed=9):
    world = synth.make_world(seed=seed)
    poses = synth.straight_trajectory(F, speed=0.8, yaw_rate=0.1)
    poses = np.vstack([poses[:1], poses])[: F + 1]
    recs = [trb._connection(
        0, b"/velodyne_points", b"sensor_msgs/PointCloud2"
    )]
    for k in range(F):
        xyz, m = synth.simulate_sweep(
            world, poses[k], poses[k + 1], n_azimuth=n_azimuth,
            seed=seed + k,
        )
        stamp = 100.0 + 0.1 * k
        recs.append(trb._message(
            0, stamp, trb._pointcloud2(stamp, xyz[m], None, None)
        ))
    trb.write_bag(path, recs)
    return F


def test_cli_golden_compare_synthetic_bag(tmp_path):
    bag = str(tmp_path / "synth.bag")
    F = _write_synth_bag(bag)
    out = str(tmp_path / "out")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/loam_jax_cache_cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "loam_tpu", "--bag", bag, "--skip", "0",
         "--imu-topic", "", "--ring-width", "512",
         "--out-dir", out, "--golden-compare"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=560,
    )
    assert r.returncode in (0, 1), r.stderr[-2000:]

    # both trajectory sets on disk
    for name in ("integrated", "golden_integrated", "golden_odom",
                 "golden_aft_mapped"):
        t, pos, _ = export.load_trajectory_tum(
            os.path.join(out, name + ".tum")
        )
        assert t.shape == (F,)
        assert np.isfinite(pos).all()

    # the verdict line: one parseable JSON object with the gate
    verdict = None
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            verdict = json.loads(line)["golden_compare"]
    assert verdict is not None, r.stdout[-2000:]
    assert verdict["gate_cm"] == 5.0
    for key in ("ate_odom_cm", "ate_aft_cm", "ate_integrated_cm"):
        assert np.isfinite(verdict[key])
    # on clean synthetic data the TPU pipeline must sit well inside the
    # 5 cm gate against the oracle (the golden-parity contract)
    assert verdict["pass"], verdict
    assert r.returncode == 0
