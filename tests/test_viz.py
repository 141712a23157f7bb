"""Visualization layer (loam_tpu/viz.py) — the rviz equivalent.

The reference's only dashboard is rviz (SURVEY.md §1 L5,
rviz_cfg/loam_velodyne.rviz:91,118,130,157); here we render the same four
displays headlessly and check the artifacts are produced and well-formed.
"""

import json
import os

import numpy as np

from loam_tpu import viz


def _fake_run(F=40, N=500, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 4 * np.pi, F)
    pos = np.stack([np.sin(t), 0.05 * t, t], axis=1)
    poses = np.concatenate([np.zeros((F, 3)), pos], axis=1)
    trajs = {
        "integrated": poses,
        "aft_mapped": poses + rng.normal(0, 0.01, poses.shape),
        "odom": poses + rng.normal(0, 0.05, poses.shape),
    }
    xyz = rng.normal(0, 5, (N, 3)).astype(np.float32)
    mask = rng.random(N) > 0.2
    return trajs, xyz, mask


def test_dashboard_png(tmp_path):
    trajs, xyz, mask = _fake_run()
    out = viz.plot_dashboard(
        str(tmp_path / "viz.png"), trajs, map_xyz=xyz, map_mask=mask,
        registered_xyz=xyz[:100], registered_mask=mask[:100],
    )
    with open(out, "rb") as f:
        header = f.read(8)
    assert header[:4] == b"\x89PNG"
    assert os.path.getsize(out) > 10000


def test_dashboard_positions_only(tmp_path):
    # accepts bare (F, 3) positions and no clouds
    trajs, _, _ = _fake_run()
    trajs = {k: v[:, 3:] for k, v in trajs.items()}
    out = viz.plot_dashboard(str(tmp_path / "v.png"), trajs)
    assert os.path.getsize(out) > 0


def test_html_viewer_selfcontained(tmp_path):
    trajs, xyz, mask = _fake_run()
    out = viz.export_html_viewer(
        str(tmp_path / "viewer.html"), trajs,
        clouds={"map": (xyz, mask)},
    )
    html = open(out).read()
    assert "<canvas" in html and "http" not in html.split("<script>")[1]
    # embedded data parses as JSON and has masked-out points removed
    payload = html.split("const DATA = ", 1)[1].split(";\n", 1)[0]
    data = json.loads(payload)
    assert {t["name"] for t in data["trajs"]} == set(trajs)
    assert len(data["clouds"][0]["pts"]) == 3 * int(mask.sum())


def test_html_viewer_downsamples(tmp_path):
    trajs, xyz, _ = _fake_run(N=5000)
    out = viz.export_html_viewer(
        str(tmp_path / "v.html"), trajs, clouds={"m": xyz},
        max_points=1000,
    )
    payload = open(out).read().split("const DATA = ", 1)[1].split(";\n", 1)[0]
    data = json.loads(payload)
    assert len(data["clouds"][0]["pts"]) <= 3 * 1001
