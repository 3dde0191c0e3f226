"""Synthetic 3D scene rendering for full-pipeline evaluation with exact
ground truth — the oracle the reference lacks (SURVEY §4: verification was
visual only).

Renders a two-plane scene (near textured plane inside a far background
plane) by ray-plane intersection + bilinear texture lookup. Two depths
break the planar degeneracy of fundamental-matrix initialization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from dr3_tpu.geometry.lie import SE3


def make_textures(rng, size=1600):
    """High-contrast binary-blob textures (FAST-friendly)."""
    def tex(seed_shift):
        base = ndimage.gaussian_filter(rng.uniform(0, 1, (size, size)), 2.5)
        soft = ndimage.gaussian_filter(rng.uniform(0, 1, (size, size)), 1.0)
        return (0.6 * (base > np.median(base)) + 0.4 * soft).astype(np.float32)

    return tex(0), tex(1)


def render_scene(cam, T: SE3, tex_near, tex_far, z_near=6.0, z_far=14.0,
                 near_halfw=2.2, near_halfh=1.6, px_per_unit=60.0):
    """Render the scene from world->cam pose T. The near plane (z=z_near)
    occupies |x|<near_halfw, |y|<near_halfh; the far plane fills the rest."""
    h, w = cam.height, cam.width
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    Tinv = T.inverse()
    R = np.asarray(Tinv.rotation().matrix())
    t = np.asarray(Tinv.t)
    d_cam = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)
    d_w = d_cam @ R.T

    def plane_hit(z_plane):
        lam = (z_plane - t[2]) / np.where(np.abs(d_w[..., 2]) < 1e-9, 1e-9,
                                          d_w[..., 2])
        pw = t + lam[..., None] * d_w
        return pw, lam

    pw_n, lam_n = plane_hit(z_near)
    pw_f, lam_f = plane_hit(z_far)
    near_mask = (np.abs(pw_n[..., 0]) < near_halfw) & \
        (np.abs(pw_n[..., 1]) < near_halfh) & (lam_n > 0)

    def lookup(tex, pw):
        # pure-numpy bilinear lookup: rendering must stay on host — on a
        # remote-relay TPU each jnp call here would re-upload the 10 MB
        # texture per frame, dominating any long-sequence run
        txy = pw[..., :2] * px_per_unit + np.asarray(tex.shape)[::-1] / 2.0
        th, tw = tex.shape
        x = np.clip(txy[..., 0], 0.0, tw - 1.001)
        y = np.clip(txy[..., 1], 0.0, th - 1.001)
        x0 = x.astype(np.int32)
        y0 = y.astype(np.int32)
        ax = (x - x0).astype(np.float32)
        ay = (y - y0).astype(np.float32)
        v00 = tex[y0, x0]
        v01 = tex[y0, x0 + 1]
        v10 = tex[y0 + 1, x0]
        v11 = tex[y0 + 1, x0 + 1]
        return ((1 - ay) * ((1 - ax) * v00 + ax * v01)
                + ay * ((1 - ax) * v10 + ax * v11))

    img = np.where(near_mask, lookup(tex_near, pw_n), lookup(tex_far, pw_f))
    return img.astype(np.float32)


def forward_trajectory(n_frames, step=0.12, yaw_rate=0.004):
    """Ground-truth world->cam poses: forward motion with gentle yaw."""
    poses = []
    for i in range(n_frames):
        tau = np.asarray([0.01 * i, 0.002 * i, -step * i,
                          0.0, yaw_rate * i, 0.0], np.float32)
        poses.append(SE3.exp(jnp.asarray(tau)))
    return poses


def gt_centers(poses):
    return np.stack([np.asarray(p.center()) for p in poses])
