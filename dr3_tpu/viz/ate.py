"""Trajectory evaluation: absolute trajectory error with Umeyama alignment.

The reference has no quantitative evaluation (SURVEY §6: no published
numbers; verification was a screenshot). This module establishes the
missing oracle: ATE RMSE after Sim(3) (monocular — scale is unobservable)
or SE(3) alignment, the standard KITTI/TUM protocol.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Alignment(NamedTuple):
    scale: float
    R: np.ndarray   # [3, 3]
    t: np.ndarray   # [3]
    rmse: float
    errors: np.ndarray  # [T] per-pose translation error after alignment


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform mapping src -> dst ([N, 3] each)."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est: np.ndarray, gt: np.ndarray, with_scale: bool = True) -> Alignment:
    """ATE RMSE between estimated and ground-truth positions [T, 3]."""
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    assert est.shape == gt.shape
    s, R, t = umeyama(est, gt, with_scale)
    aligned = (s * (R @ est.T)).T + t
    err = np.linalg.norm(aligned - gt, axis=-1)
    return Alignment(scale=s, R=R, t=t, rmse=float(np.sqrt((err**2).mean())),
                     errors=err)
