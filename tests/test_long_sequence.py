"""Long-sequence drift + checkpointed scale replay (VERDICT r1 #8).

A 200-frame figure8 replay measuring drift as %-of-distance (the metric
the LOAM paper reports: ~0.55% translational on KITTI), exercising
mid-sequence checkpoint/resume at that scale.
"""

import dataclasses

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

F = 200


@pytest.fixture(scope="module")
def figure8_data():
    world = synth.make_world(seed=9)
    poses = synth.figure8_trajectory(F, speed=1.0)
    poses = np.vstack([poses[:1], poses])[: F + 1]
    sweeps = [
        synth.simulate_sweep(
            world, poses[k], poses[k + 1], n_azimuth=600, seed=9 + k
        )
        for k in range(F)
    ]
    raw = np.stack([s[0] for s in sweeps])
    msk = np.stack([s[1] for s in sweeps])
    return raw, msk, poses


def test_figure8_200_frame_drift(figure8_data):
    raw, msk, poses = figure8_data
    outs = pipeline.replay_sweeps(jnp.asarray(raw), jnp.asarray(msk), CFG)
    est = np.asarray(outs.pose_integrated)[:, 3:6]
    gt = poses[1 : F + 1, 3:6]
    assert np.isfinite(est).all()

    dist = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))
    final_err = float(np.linalg.norm(est[-1] - gt[-1]))
    drift_pct = 100.0 * final_err / dist
    ate = metrics.ate_rmse(est, gt)
    # ~20 m travelled; the mapping stage must bound the error well under
    # the scan-to-scan drift rate.  (LOAM paper: ~0.55% on KITTI.)
    assert drift_pct < 1.0, (drift_pct, final_err, dist)
    assert ate < 0.12, ate


def test_checkpoint_resume_mid_long_sequence(figure8_data, tmp_path):
    """Split the 200-frame replay 120/80 with an orbax checkpoint in the
    middle (full estimator pytree incl. the HBM map): the resumed run
    must continue the trajectory exactly."""
    raw, msk, _ = figure8_data
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
