"""Trajectory evaluation: ATE and RPE.

The reference ships no evaluation at all (outputs were recorded to rosbags
and evaluated offline, ref: launch/geodeAlpha.launch.py:53-77); here the
standard KITTI/TUM-style metrics are built in so every sequence run reports
accuracy directly.
"""

from __future__ import annotations

import numpy as np


def _as_positions(poses: np.ndarray) -> np.ndarray:
    if poses.ndim == 3:
        return poses[:, :3, 3]
    return poses


def umeyama_alignment(est: np.ndarray, gt: np.ndarray, with_scale: bool = False):
    """Least-squares SE(3) (optionally Sim(3)) alignment est -> gt.

    Returns (s, R, t) minimizing ||gt - (s R est + t)||.
    """
    mu_e, mu_g = est.mean(0), gt.mean(0)
    xe, xg = est - mu_e, gt - mu_g
    cov = xg.T @ xe / len(est)
    u, d, vt = np.linalg.svd(cov)
    s_mat = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s_mat[2, 2] = -1
    rot = u @ s_mat @ vt
    scale = float(np.trace(np.diag(d) @ s_mat) / (xe**2).sum() * len(est)) if with_scale else 1.0
    trans = mu_g - scale * rot @ mu_e
    return scale, rot, trans


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray, align: str = "umeyama") -> float:
    """Absolute trajectory error RMSE [m] over positions.

    align: "umeyama" (SE(3) fit), "first" (anchor first pose), or "none".
    """
    est = _as_positions(est_poses)
    gt = _as_positions(gt_poses)
    assert est.shape == gt.shape, (est.shape, gt.shape)
    if align == "umeyama" and len(est) >= 3:
        s, r, t = umeyama_alignment(est, gt)
        est = (s * (r @ est.T)).T + t
    elif align == "first":
        est = est - est[0] + gt[0]
    err = est - gt
    return float(np.sqrt((err**2).sum(axis=1).mean()))


def rpe(est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1):
    """Relative pose error over `delta`-frame intervals.

    Returns (rmse translation [m], rmse rotation [rad]). Requires [N,4,4]."""
    assert est_poses.ndim == 3 and gt_poses.ndim == 3
    t_errs, r_errs = [], []
    for i in range(len(est_poses) - delta):
        de = np.linalg.inv(est_poses[i]) @ est_poses[i + delta]
        dg = np.linalg.inv(gt_poses[i]) @ gt_poses[i + delta]
        err = np.linalg.inv(dg) @ de
        t_errs.append(np.linalg.norm(err[:3, 3]))
        cos_a = np.clip((np.trace(err[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
        r_errs.append(np.arccos(cos_a))
    return float(np.sqrt(np.mean(np.square(t_errs)))), float(np.sqrt(np.mean(np.square(r_errs))))
