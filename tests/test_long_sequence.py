"""Long-sequence drift + checkpointed scale replay (VERDICT r1 #8).

A figure8 replay measuring drift as %-of-distance (the metric the LOAM
paper reports: ~0.55% translational on KITTI), exercising mid-sequence
checkpoint/resume at scale.

Two tiers (VERDICT r4 #6 — the drift gate must be affordable enough to
run every round):

* test_figure8_100_frame_drift — ALWAYS runs; deterministic ray-cast
  fixture cached on disk (/tmp/loam_fixture_cache), so reruns cost only
  the (compile-cached) replay.
* the 200-frame drift + checkpoint tests — the original scale gates,
  now opt-in via LOAM_SLOW_TESTS=1 (>10 min on a 2-core container).
"""

import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from loam_tpu.config import LoamConfig
from loam_tpu.io import synth
from loam_tpu import checkpoint, metrics, pipeline

CFG = dataclasses.replace(
    LoamConfig(),
    ring_width=1024,
    odom_y_scale=1.0,           # synthetic GT has no VLP-16 ry bias
    odom_weight_start_iter=0,   # sparse synthetic walls (see /verify notes)
    corner_table_size=1 << 15,
    surf_table_size=1 << 17,
    # corrected-semantics mode: textbook GN rows + full correspondence
    # window.  Measured on this 200-frame figure8: 0.62% drift / 9 cm ATE
    # vs 3.25% / 32 cm with the reference's accumulation + truncation
    # quirks (which the golden-parity suite pins separately).
    odom_accumulate_rows=False,
    emulate_upward_scan_truncation=False,
)

F_FULL = 200
F_FAST = 100

slow = pytest.mark.skipif(
    not os.environ.get("LOAM_SLOW_TESTS"),
    reason="200-frame tier: >10 min on 2 cores; set LOAM_SLOW_TESTS=1",
)

_CACHE_DIR = os.environ.get("LOAM_FIXTURE_CACHE", "/tmp/loam_fixture_cache")
_CACHE = os.path.join(_CACHE_DIR, "figure8_s9_az600_v1.npz")


def _figure8(F):
    """First F frames of the deterministic seed-9 figure8 sequence.

    The host-side ray cast is the expensive part (~2 s/frame on this
    container); the fixture is bit-deterministic, so it is cached on
    disk and extended in place when a longer prefix is first needed."""
    raw = msk = None
    if os.path.exists(_CACHE):
        try:
            z = np.load(_CACHE)
            if z["raw"].shape[0] >= F:
                raw, msk = z["raw"], z["msk"]
        except Exception:
            raw = msk = None
    poses = synth.figure8_trajectory(F_FULL, speed=1.0)
    poses = np.vstack([poses[:1], poses])[: F_FULL + 1]
    if raw is None:
        world = synth.make_world(seed=9)
        sweeps = [
            synth.simulate_sweep(
                world, poses[k], poses[k + 1], n_azimuth=600, seed=9 + k
            )
            for k in range(F)
        ]
        raw = np.stack([s[0] for s in sweeps])
        msk = np.stack([s[1] for s in sweeps])
        try:
            os.makedirs(_CACHE_DIR, exist_ok=True)
            np.savez_compressed(_CACHE, raw=raw, msk=msk)
        except OSError:
            pass
    return raw[:F], msk[:F], poses[: F + 1]


def _drift_gate(F, max_drift_pct, max_ate, cfg=CFG):
    raw, msk, poses = _figure8(F)
    outs = pipeline.replay_sweeps(jnp.asarray(raw), jnp.asarray(msk), cfg)
    est = np.asarray(outs.pose_integrated)[:, 3:6]
    gt = poses[1 : F + 1, 3:6]
    assert np.isfinite(est).all()

    dist = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))
    final_err = float(np.linalg.norm(est[-1] - gt[-1]))
    drift_pct = 100.0 * final_err / dist
    ate = metrics.ate_rmse(est, gt)
    assert drift_pct < max_drift_pct, (drift_pct, final_err, dist)
    assert ate < max_ate, ate


def test_figure8_100_frame_drift():
    """The every-round drift gate: 100 frames (~10 m travelled) of the
    hybrid exact-kNN cadence (map_exact_regather_every=5 — the TPU fast
    mode, pinned to the strict path by tests/test_knn_prune.py and the
    5 cm oracle gate in tests/test_golden_parity.py).  The strict
    per-iteration CPU replay alone costs ~8 min on 2 cores, which is
    what kept this gate from running every round (VERDICT r4 #6); the
    slow tier keeps strict semantics and the strict thresholds.

    Hybrid thresholds: measured baseline on this fixture is 1.10% drift
    / 10.9 cm final error (vs <1% strict) — the cadence's quantified
    accuracy cost; the gate bounds regression from that baseline."""
    _drift_gate(
        F_FAST, max_drift_pct=1.5, max_ate=0.15,
        cfg=dataclasses.replace(CFG, map_exact_regather_every=5),
    )


@slow
def test_figure8_200_frame_drift():
    _drift_gate(F_FULL, max_drift_pct=1.0, max_ate=0.12)


@slow
def test_checkpoint_resume_mid_long_sequence(tmp_path):
    """Split the 200-frame replay 120/80 with an orbax checkpoint in the
    middle (full estimator pytree incl. the HBM map): the resumed run
    must continue the trajectory exactly."""
    raw, msk, _ = _figure8(F_FULL)
    outs_full, final = pipeline.replay_sweeps(
        jnp.asarray(raw), jnp.asarray(msk), CFG, return_state=True
    )

    outs_a, state_mid = pipeline.replay_sweeps(
        jnp.asarray(raw[:120]), jnp.asarray(msk[:120]), CFG,
        return_state=True,
    )
    mgr = checkpoint.CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(120, state_mid, metadata={"frame": 120}, wait=True)
    restored, meta = mgr.restore(120, state_mid)
    assert meta["frame"] == 120
    mgr.close()

    outs_b = pipeline.replay_sweeps(
        jnp.asarray(raw[120:]), jnp.asarray(msk[120:]), CFG,
        state0=restored,
    )
    resumed = np.concatenate(
        [np.asarray(outs_a.pose_integrated),
         np.asarray(outs_b.pose_integrated)]
    )
    np.testing.assert_allclose(
        resumed, np.asarray(outs_full.pose_integrated), atol=1e-4
    )
