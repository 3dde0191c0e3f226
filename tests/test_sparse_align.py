"""Sparse image alignment tests: recover a known pose perturbation on a
rendered 3D scene."""

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from dr3_tpu.geometry.lie import SE3
from dr3_tpu.models.camera import Pinhole
from dr3_tpu.ops.sparse_align import sparse_align
from dr3_tpu.ops.warp import bilinear_sample


def render_plane(cam, T, texture, plane_z=5.0, level_scale=1.0):
    """Render a textured fronto-parallel plane at depth plane_z seen from
    world->cam pose T (texture indexed by world x,y in [0, tw) px units)."""
    h = int(cam.height * level_scale)
    w = int(cam.width * level_scale)
    fx, fy = cam.fx * level_scale, cam.fy * level_scale
    cx, cy = cam.cx * level_scale, cam.cy * level_scale
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    # ray through pixel in cam frame, intersect plane z=plane_z in world
    Tinv = T.inverse()
    R = np.asarray(Tinv.rotation().matrix())
    t = np.asarray(Tinv.t)
    d_cam = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)
    d_w = d_cam @ R.T
    lam = (plane_z - t[2]) / d_w[..., 2]
    pw = t + lam[..., None] * d_w
    # texture lookup: 40 px per world unit, centered
    tex_xy = pw[..., :2] * 40.0 + np.asarray(texture.shape)[::-1] / 2.0
    vals, _ = bilinear_sample(jnp.asarray(texture), jnp.asarray(tex_xy), clamp=True)
    return np.asarray(vals)


def test_sparse_align_recovers_pose(rng):
    cam = Pinhole.create(320, 240, 260.0, 260.0, 160.0, 120.0)
    texture = ndimage.gaussian_filter(
        rng.uniform(0, 1, (1200, 1200)), 2.0).astype(np.float32)

    T_ref = SE3.identity()
    tau_true = jnp.asarray([0.05, -0.03, 0.08, 0.004, -0.006, 0.003])
    T_cur = SE3.exp(tau_true)

    lvl = 1
    s = 0.5 ** lvl
    img_ref = render_plane(cam, T_ref, texture, level_scale=s)
    img_cur = render_plane(cam, T_cur, texture, level_scale=s)

    # landmarks on the plane (world z=5), seen in the reference frame
    pts = np.stack([rng.uniform(-2.0, 2.0, 120), rng.uniform(-1.5, 1.5, 120),
                    np.full(120, 5.0)], -1).astype(np.float32)
    valid = jnp.ones(120, bool)

    res = sparse_align(jnp.asarray(img_ref), jnp.asarray(img_cur),
                       T_ref, T_ref, cam, jnp.asarray(pts), valid,
                       level=lvl, half_patch=3, iters=25)
    assert float(res.cost) < float(res.cost0) * 0.1
    err = np.asarray((res.T @ T_cur.inverse()).log())
    assert np.abs(err[:3]).max() < 0.02    # translation to 2 cm
    assert np.abs(err[3:]).max() < 0.004   # rotation to ~0.2 deg


def test_sparse_align_identity_stays(rng):
    cam = Pinhole.create(320, 240, 260.0, 260.0, 160.0, 120.0)
    texture = ndimage.gaussian_filter(
        rng.uniform(0, 1, (1200, 1200)), 2.0).astype(np.float32)
    img = render_plane(cam, SE3.identity(), texture, level_scale=0.5)
    pts = np.stack([rng.uniform(-2, 2, 60), rng.uniform(-1.5, 1.5, 60),
                    np.full(60, 5.0)], -1).astype(np.float32)
    res = sparse_align(jnp.asarray(img), jnp.asarray(img), SE3.identity(),
                       SE3.identity(), cam, jnp.asarray(pts),
                       jnp.ones(60, bool), level=1, half_patch=3, iters=10)
    drift = np.abs(np.asarray(res.T.log())).max()
    assert drift < 1e-4
