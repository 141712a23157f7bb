"""Trajectory accuracy metrics (ATE / RPE).

The reference never measures accuracy in-repo (SURVEY.md §5); these are
the standard metrics used by BASELINE.md's north-star gate (ATE <= 5 cm on
the validation sequence)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def ate_rmse(est_pos, gt_pos, align: bool = False):
    """Absolute trajectory error RMSE over positions (F, 3).

    align=True applies a rigid Umeyama alignment (rotation+translation,
    no scale) before computing the error.
    """
    est = np.asarray(est_pos, np.float64)
    gt = np.asarray(gt_pos, np.float64)
    if align:
        est = umeyama_align(est, gt)
    err = est - gt
    return float(np.sqrt(np.mean(np.sum(err * err, axis=1))))


def umeyama_align(src, dst):
    """Rigid alignment of src onto dst (no scale)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    cs = src - mu_s
    cd = dst - mu_d
    H = cs.T @ cd
    U, _, Vt = np.linalg.svd(H)
    S = np.eye(3)
    if np.linalg.det(Vt.T @ U.T) < 0:
        S[2, 2] = -1
    R = Vt.T @ S @ U.T
    return (R @ cs.T).T + mu_d


def rpe_rmse(est_pos, gt_pos, delta: int = 1):
    """Relative pose (translation) error RMSE over windows of `delta`."""
    est = np.asarray(est_pos, np.float64)
    gt = np.asarray(gt_pos, np.float64)
    de = est[delta:] - est[:-delta]
    dg = gt[delta:] - gt[:-delta]
    err = de - dg
    return float(np.sqrt(np.mean(np.sum(err * err, axis=1))))


def trajectory_positions(pose6_seq):
    """Extract (F, 3) positions from (F, 6) [r, t] poses."""
    return jnp.asarray(pose6_seq)[..., 3:6]
