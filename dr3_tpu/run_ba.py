"""Offline bundle adjustment over BAL problem files (the TPU-native
counterpart of the reference's Ceres BAL adjuster, tests/ceres/ba.cc:21-167).

    python -m dr3_tpu.run_ba problem.bal --iters 30 --out refined.bal \
        --render cloud.png

Reads Snavely's BAL text format, solves with the jitted Schur-complement
LM (ba/schur_lm.py), reports initial/final cost (ba.cc prints the Ceres
FullReport), and optionally writes the refined problem back out and/or
renders the refined point cloud + camera frusta to a PNG (replacing the
reference's Pangolin viewer).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bal", help="BAL problem file")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--huber", type=float, default=5.0,
                    help="Huber scale in pixels (reference BA has none and "
                         "diverges on outliers; 0 disables)")
    ap.add_argument("--out", default=None, help="write refined BAL here")
    ap.add_argument("--render", default=None,
                    help="render refined cloud + camera frusta to this PNG")
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    args = ap.parse_args(argv)


    from dr3_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from dr3_tpu.ba.schur_lm import bundle_adjust
    from dr3_tpu.io.bal import bal_to_problem, load_bal, problem_to_bal, save_bal

    data = load_bal(args.bal)
    prob = bal_to_problem(data)
    print(f"loaded {prob.n_cams} cams, {prob.n_points} points, "
          f"{prob.n_obs} observations from {args.bal}")

    t0 = time.perf_counter()
    res = bundle_adjust(prob, args.iters,
                        huber_delta=args.huber if args.huber > 0 else 1e9)
    jax.block_until_ready(res.final_cost)
    dt = time.perf_counter() - t0
    it_s = args.iters / dt
    print(f"cost: {float(res.initial_cost):.6g} -> "
          f"{float(res.final_cost):.6g} "
          f"({int(res.n_accepted)}/{args.iters} steps accepted, "
          f"{dt:.2f}s incl. compile, {it_s:.1f} LM iters/s)")

    if args.out:
        save_bal(args.out, problem_to_bal(res.problem))
        print(f"wrote {args.out}")
    if args.render:
        from dr3_tpu.geometry.lie import SE3
        from dr3_tpu.viz.draw3d import render_map

        T = SE3(res.problem.cam_wxyz, res.problem.cam_t)
        centers = np.asarray(T.inverse().t)
        render_map(centers, np.asarray(res.problem.points),
                   path=args.render)
        print(f"wrote {args.render}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
