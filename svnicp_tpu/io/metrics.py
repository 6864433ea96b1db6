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


def _so3_log_np(r: np.ndarray) -> np.ndarray:
    cos_a = np.clip((np.trace(r) - 1.0) / 2.0, -1.0, 1.0)
    a = np.arccos(cos_a)
    if a < 1e-8:
        return np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0],
                         r[1, 0] - r[0, 1]]) / 2.0
    return a / (2.0 * np.sin(a)) * np.array(
        [r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])


def nees(est_poses: np.ndarray, gt_poses: np.ndarray, guess_poses: np.ndarray,
         covs: np.ndarray) -> tuple[float, np.ndarray]:
    """Normalized estimation error squared of the per-frame ICP correction.

    SVN-ICP's product is not just a pose but a per-frame 6-DoF measurement
    covariance (the particle spread). This checks its CALIBRATION: for each
    frame the estimated correction c_est = guess^-1 . est and the true
    correction c_true = guess^-1 . gt are expressed in the correction
    coordinates [t(3), log R(3)] the covariance lives in, and
    NEES_k = e^T Sigma_k^-1 e with e = c_est - c_true. A perfectly
    calibrated 6-DoF covariance gives mean NEES ~ 6; << 6 means the spread
    over-covers (conservative), >> 6 means overconfident.

    est/gt may live in different world frames (the pipeline bootstraps at
    identity while ground truth usually doesn't); est and guess are first
    mapped into the gt frame by anchoring the first poses, since a constant
    world offset would otherwise dominate every per-frame error.

    Inputs: [N,4,4] est/gt/guess poses and [N,6,6] covariances; frames with
    singular covariance are skipped. Returns (mean NEES, per-frame values).
    """
    t0 = gt_poses[0] @ np.linalg.inv(est_poses[0])
    est_poses = t0[None] @ est_poses
    guess_poses = t0[None] @ guess_poses
    vals = []
    for i in range(len(est_poses)):
        g = guess_poses[i]
        rg, tg = g[:3, :3], g[:3, 3]

        def corr(pose):
            rc = rg.T @ pose[:3, :3]
            tc = rg.T @ (pose[:3, 3] - tg)
            return np.concatenate([tc, _so3_log_np(rc)])

        e = corr(est_poses[i]) - corr(gt_poses[i])
        try:
            vals.append(float(e @ np.linalg.solve(covs[i], e)))
        except np.linalg.LinAlgError:
            continue
    vals = np.asarray(vals)
    return (float(vals.mean()) if len(vals) else float("nan")), vals
