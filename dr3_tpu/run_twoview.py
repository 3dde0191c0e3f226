"""Two-view geometry runner (reference tests/test_twoview.cpp:4-22 +
tests/test_init_generalized.cpp:29-79).

    # F estimation + epipolar-line rendering on an image pair
    python -m dr3_tpu.run_twoview left.png right.png --out epipolar.png

    # full SfM bootstrap (KITTI intrinsics by default): relative pose,
    # triangulated map, optional 3D point-cloud render
    python -m dr3_tpu.run_twoview kitti0.png kitti4.png --init --map map.png
"""

from __future__ import annotations

# direct-script invocation (python dr3_tpu/run_X.py) from any cwd: put the
# repo root on sys.path so the package imports resolve
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("left")
    ap.add_argument("right")
    ap.add_argument("--out", default="epipolar.png",
                    help="epipolar-line rendering output")
    ap.add_argument("--init", action="store_true",
                    help="run the full two-view SfM bootstrap")
    ap.add_argument("--map", default=None,
                    help="with --init: render the triangulated cloud here")
    ap.add_argument("--fx", type=float, default=718.856)
    ap.add_argument("--fy", type=float, default=718.856)
    ap.add_argument("--cx", type=float, default=607.1928)
    ap.add_argument("--cy", type=float, default=185.2157)
    ap.add_argument("--seed", type=int, default=0)
    args, unknown = ap.parse_known_args(argv)

    from dr3_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from dr3_tpu.geometry.ransac import ransac_fundamental
    from dr3_tpu.io.image import load_image, to_gray
    from dr3_tpu.pipelines.stitch import find_correspondences
    from dr3_tpu.utils.config import Config
    from dr3_tpu.viz.draw2d import draw_epipolar

    cfg = Config.from_cli(unknown)
    left = load_image(args.left)
    right = load_image(args.right)
    lg, rg = jnp.asarray(to_gray(left)), jnp.asarray(to_gray(right))

    p1, p2, w = find_correspondences(lg, rg, cfg)
    key = jax.random.PRNGKey(args.seed)
    fr = ransac_fundamental(key, p1, p2, w, n_samples=cfg.init_ransac_iters,
                            sigma=cfg.init_sigma)
    inl = np.asarray(fr.inliers)
    print(f"matches: {int(np.asarray(w).sum())}  F-inliers: {inl.sum()}")
    print("F =\n", np.asarray(fr.model))
    draw_epipolar(np.asarray(left), np.asarray(right), np.asarray(fr.model),
                  np.asarray(p1)[inl], np.asarray(p2)[inl], path=args.out)
    print("wrote", args.out)

    if args.init:
        from dr3_tpu.pipelines.twoview_init import initialize_two_view

        K = jnp.asarray([[args.fx, 0, args.cx],
                         [0, args.fy, args.cy],
                         [0, 0, 1.0]], jnp.float32)
        res = initialize_two_view(key, p1, p2, w > 0, K, cfg)
        R = np.asarray(res.T_cur_ref.rotation().matrix())
        t = np.asarray(res.T_cur_ref.t)
        print(f"bootstrap success: {bool(res.success)}  "
              f"triangulated: {int(res.n_good)}  "
              f"parallax: {float(res.parallax):.2f} deg")
        print("R =\n", R)
        print("t =", t)
        if args.map:
            from dr3_tpu.viz.draw3d import render_map

            good = np.asarray(res.good)
            traj = np.stack([np.zeros(3, np.float32),
                             -R.T @ t]).astype(np.float32)
            render_map(traj, np.asarray(res.points)[good], path=args.map)
            print("wrote", args.map)
    return 0


if __name__ == "__main__":
    sys.exit(main())
