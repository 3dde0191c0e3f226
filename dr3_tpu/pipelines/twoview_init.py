"""Two-view map bootstrap (ORB-SLAM-style initializer).

Parity with the reference's InitHelper::Initialize + ReconstructF
(reference src/initialization.cpp:18-349) and the scale normalization of
Init::process_second_frame (:703-714), as one jitted program:

* normalized 8-point F RANSAC, 200 pre-sampled hypotheses, MAD
  normalization, symmetric chi-square scoring (th=3.841, thScore=5.991),
* E = K^T F K, 4-hypothesis decomposition, batched CheckRT with parallax +
  4 sigma^2 reprojection gating,
* acceptance requires a clear winner (second-best < 0.7 * best), enough
  triangulated points (>= max(0.9 N_inliers, cfg threshold)) and minimum
  parallax (1.0 deg, initialization.cpp:286-306),
* median-depth rescale to cfg.map_scale (vk::getMedian equivalent).

Returns fixed-shape results + a success flag; the caller branches on host.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr3_tpu.geometry import epipolar
from dr3_tpu.geometry.lie import SE3, SO3
from dr3_tpu.geometry.ransac import ransac_fundamental
from dr3_tpu.utils.config import Config


class InitResult(NamedTuple):
    success: jnp.ndarray      # [] bool
    T_cur_ref: SE3            # pose of cur w.r.t. ref (unit-scale t, rescaled)
    points: jnp.ndarray       # [N, 3] triangulated in ref frame, rescaled
    good: jnp.ndarray         # [N] bool triangulated inliers
    n_good: jnp.ndarray       # [] int
    parallax: jnp.ndarray     # [] deg
    median_depth: jnp.ndarray # [] pre-rescale median depth


@functools.partial(jax.jit, static_argnums=(5,))
def initialize_two_view(key: jax.Array, p_ref: jnp.ndarray, p_cur: jnp.ndarray,
                        valid: jnp.ndarray, K: jnp.ndarray,
                        cfg: Config = Config()) -> InitResult:
    w = valid.astype(p_ref.dtype)
    fr = ransac_fundamental(key, p_ref, p_cur, w,
                            n_samples=cfg.init_ransac_iters, sigma=cfg.init_sigma)

    E = epipolar.essential_from_fundamental(fr.model, K)
    hyp = epipolar.decompose_essential(E)
    w_inl = fr.inliers.astype(p_ref.dtype)
    sigma2 = cfg.init_sigma ** 2
    results = jax.vmap(
        lambda R, t: epipolar.check_rt(R, t, p_ref, p_cur, w_inl, K, sigma2)
    )(hyp.R, hyp.t)

    n = results.n_good
    best = jnp.argmax(n)
    nmax = n[best]
    n_similar = jnp.sum(n.astype(jnp.float32) > 0.7 * nmax)
    n_inliers = jnp.sum(fr.inliers.astype(jnp.int32))

    # acceptance (ReconstructF, initialization.cpp:286-306): unique winner,
    # >= 90% of inliers triangulated or the configured floor, min parallax
    min_good = jnp.maximum(
        (0.9 * n_inliers.astype(jnp.float32)).astype(jnp.int32),
        cfg.init_min_triangulated)
    success = (n_similar == 1) & (nmax >= min_good) & \
        (results.parallax[best] > 1.0)

    R = hyp.R[best]
    t = hyp.t[best]
    good = results.good[best]
    pts = results.points[best]

    # median depth over good points (getMedian, initialization.cpp:703-714)
    z = jnp.where(good, pts[..., 2], jnp.nan)
    med = jnp.nanmedian(z)
    med = jnp.where(jnp.isfinite(med) & (med > 1e-6), med, 1.0)
    scale = cfg.map_scale / med

    T = SE3(SO3.from_matrix(R).wxyz, t * scale)
    return InitResult(success=success, T_cur_ref=T, points=pts * scale,
                      good=good, n_good=nmax, parallax=results.parallax[best],
                      median_depth=med)
