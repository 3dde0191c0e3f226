"""Homography estimation (DLT) + planar transform utilities.

Covers the reference's 2D transform + homography layer:
* affine translate/rotate/scale mats (reference src/utils.cpp:20-42),
* DLT homography from point matches (src/utils.cpp:44-89): build the 2Nx9
  system, take the null direction, reshape 3x3 — here batched and normalized
  (Hartley) for conditioning,
* translation-only fit (reference Stitch Transformation::Translate,
  src/stitch.cpp:203-217): mean displacement.

All solvers take fixed-capacity point arrays plus a weight/mask vector so
they jit with static shapes and slot directly into vmapped RANSAC.
"""

from __future__ import annotations

import jax.numpy as jnp

from dr3_tpu.geometry.linalg import smallest_eigvec_gram


# ---------------------------------------------------------------------------
# affine 2x3 transforms (reference src/utils.cpp:20-42)
# ---------------------------------------------------------------------------

def affine_translate(tx: float, ty: float) -> jnp.ndarray:
    return jnp.asarray([[1.0, 0.0, tx], [0.0, 1.0, ty]], jnp.float32)


def affine_rotate(cx: float, cy: float, angle_deg: float, scale: float = 1.0) -> jnp.ndarray:
    """2x3 rotation about (cx, cy) — cv::getRotationMatrix2D semantics."""
    a = jnp.deg2rad(angle_deg)
    alpha = scale * jnp.cos(a)
    beta = scale * jnp.sin(a)
    return jnp.asarray(
        [[alpha, beta, (1 - alpha) * cx - beta * cy],
         [-beta, alpha, beta * cx + (1 - alpha) * cy]], jnp.float32)


def affine_scale(sx: float, sy: float) -> jnp.ndarray:
    return jnp.asarray([[sx, 0.0, 0.0], [0.0, sy, 0.0]], jnp.float32)


# ---------------------------------------------------------------------------
# homogeneous transform application
# ---------------------------------------------------------------------------

def apply_homography(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 3x3 H to points [..., 2]; perspective divide with z-guard."""
    x, y = pts[..., 0], pts[..., 1]
    w = H[..., 2, 0] * x + H[..., 2, 1] * y + H[..., 2, 2]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    u = (H[..., 0, 0] * x + H[..., 0, 1] * y + H[..., 0, 2]) / w
    v = (H[..., 1, 0] * x + H[..., 1, 1] * y + H[..., 1, 2]) / w
    return jnp.stack([u, v], axis=-1)


def normalize_points(pts: jnp.ndarray, weights: jnp.ndarray):
    """Hartley normalization with weights: similarity T s.t. weighted points
    have zero mean and mean distance sqrt(2). Returns (pts_n, T [3,3])."""
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)
    mean = jnp.sum(pts * weights[..., None], axis=0) / wsum
    centered = pts - mean
    meandist = jnp.sum(jnp.linalg.norm(centered, axis=-1) * weights) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(meandist, 1e-9)
    T = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], pts.dtype)
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return centered * s, T


def fit_homography(src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray | None = None,
                   normalize: bool = True) -> jnp.ndarray:
    """Weighted DLT homography mapping src -> dst.

    src, dst: [N, 2]; weights: [N] (0 masks a row out — static shapes).
    The 2Nx9 system follows reference src/utils.cpp:48-88; each match
    contributes the two rows
      [-x, -y, -1, 0, 0, 0, u x, u y, u]
      [0, 0, 0, -x, -y, -1, v x, v y, v].
    """
    n = src.shape[0]
    if weights is None:
        weights = jnp.ones((n,), src.dtype)
    if normalize:
        src_n, Ts = normalize_points(src, weights)
        dst_n, Td = normalize_points(dst, weights)
    else:
        src_n, dst_n = src, dst
        Ts = Td = jnp.eye(3, dtype=src.dtype)

    x, y = src_n[..., 0], src_n[..., 1]
    u, v = dst_n[..., 0], dst_n[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0) * jnp.concatenate([weights, weights])[:, None]
    h = smallest_eigvec_gram(A)
    Hn = h.reshape(3, 3)
    # denormalize: H = Td^-1 Hn Ts
    Tdinv = jnp.linalg.inv(Td)
    H = Tdinv @ Hn @ Ts
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def fit_translation(src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Translation-only 'homography' = weighted mean displacement as a 3x3
    (reference Stitch::least_squares_fit Translate branch, src/stitch.cpp:203-217)."""
    n = src.shape[0]
    if weights is None:
        weights = jnp.ones((n,), src.dtype)
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)
    d = jnp.sum((dst - src) * weights[:, None], axis=0) / wsum
    H = jnp.eye(3, dtype=src.dtype)
    return H.at[0, 2].set(d[0]).at[1, 2].set(d[1])


def transfer_error(H: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Forward transfer distance ||H src - dst|| per match (src/stitch.cpp:156-184)."""
    return jnp.linalg.norm(apply_homography(H, src) - dst, axis=-1)


def symmetric_transfer_error(H: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    Hinv = jnp.linalg.inv(H)
    fwd = jnp.sum((apply_homography(H, src) - dst) ** 2, axis=-1)
    bwd = jnp.sum((apply_homography(Hinv, dst) - src) ** 2, axis=-1)
    return fwd + bwd
