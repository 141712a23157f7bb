"""Live visualization server (viz_live.LiveServer) — the rviz
equivalent (L5): while the streaming engine estimates online, an HTTP
poller must see the viewer page, a growing pose trail, and the
rate-limited surround map cloud."""

import dataclasses
import json
import urllib.request

import numpy as np

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu.runtime.streaming import StreamingEngine
from loam_tpu.viz_live import LiveServer

CFG = dataclasses.replace(
    LoamConfig(),
    ring_width=512,
    max_less_flat=4096,
    less_flat_ring_cap=256,
    corner_table_size=1 << 12,
    surf_table_size=1 << 13,
    search_buckets=1 << 10,
    max_corner_from_map=1024,
    max_surf_from_map=2048,
    max_corner_stack=512,
    max_surf_stack=1024,
    odom_max_iters=5,
    map_max_iters=3,
    # live /velodyne_cloud_registered (rviz display parity,
    # rviz_cfg/loam_velodyne.rviz:157)
    emit_registered=True,
)


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.read()


def test_live_server_serves_state_and_page():
    world = synth.make_world(seed=3)
    F = 5
    poses = synth.straight_trajectory(F, speed=0.8)
    poses = np.vstack([poses[:1], poses])[: F + 1]

    eng = StreamingEngine(CFG)
    eng.start()
    live = LiveServer(eng, port=0, surround_every=0.0).start()
    try:
        # page first — must be valid HTML with the poll loop
        status, body = _get(live.url)
        assert status == 200
        assert b"state.json" in body and b"<canvas" in body

        # state before any data: well-formed, empty-ish
        status, body = _get(live.url + "state.json")
        s0 = json.loads(body)
        assert status == 200 and s0["stats"]["odom_frames"] == 0

        for k in range(F):
            xyz, m = synth.simulate_sweep(
                world, poses[k], poses[k + 1], n_azimuth=300, seed=3 + k
            )
            eng.push_sweep(xyz, m, t_scan=0.1 * k)
            eng.drain(timeout_s=120)

        status, body = _get(live.url + "state.json")
        s1 = json.loads(body)
        assert s1["stats"]["odom_frames"] == F
        assert s1["stats"]["map_frames"] >= 1
        assert len(s1["trajectory"]) >= F - 1
        assert len(s1["integrated"]) == 6
        assert np.isfinite(np.asarray(s1["integrated"])).all()
        # the surround cloud (the /laser_cloud_surround analogue) holds
        # live map centroids once mapping has run
        assert len(s1["surround"]) > 100
        # all four rviz displays (rviz_cfg/loam_velodyne.rviz:91,118,
        # 130,157): trail + odometry pose + surround + registered cloud
        assert len(s1["odom"]) == 6
        assert np.isfinite(np.asarray(s1["odom"])).all()
        assert len(s1["registered"]) > 100, (
            "registered full-res cloud missing from /state.json"
        )
        assert np.isfinite(np.asarray(s1["registered"])).all()
        assert s1["seq"] > s0["seq"]

        # 404 on unknown paths
        try:
            _get(live.url + "nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        live.stop()
        eng.stop()
