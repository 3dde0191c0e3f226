"""Export a REAL-STRUCTURE BAL problem from a VO/SLAM run and solve it
with the exact Snavely adjuster (round-4 verdict item 8: the BAL path had
only ever been validated on self-rendered random problems).

Pipeline: run the forward-corridor VO (continuously novel content, so the
keyframe database keeps growing past 50+ cameras), flatten the loop
database + map into the global-BA observation table
(pipelines/loop_closure.global_ba_problem — the reference's
src/optimizer.cpp:29-41 layout), compact + export it through io/bal.py's
BAL writer, then ROUND-TRIP: load the file back, convert to the 9-param
Snavely objective, and solve with both the explicit and PCG Schur paths,
checking final-cost parity. The structure (co-visibility graph, point
depth distribution, observation sparsity) is the real thing a SLAM map
produces, not a synthetic uniform draw.

    python tools/make_real_bal.py --frames 420 [--cpu] [--width 1240]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_bal(vo, path: str):
    """Flatten the driver's loop database + map into a compact BAL file:
    only valid cameras, weight>0 observations, and points with >=2
    observations survive (BAL files carry no masks)."""
    import jax.numpy as jnp

    from dr3_tpu.io.bal import problem_to_bal, save_bal
    from dr3_tpu.pipelines import loop_closure as lc

    prob = lc.global_ba_problem(vo.loop_db, vo.map, vo.intr, vo.cam.dist)
    w = np.asarray(prob.obs_w)
    oc = np.asarray(prob.obs_cam)
    op = np.asarray(prob.obs_pt)
    uv = np.asarray(prob.obs_uv)
    keep = w > 0

    # points need >=2 observations to be constrained in a standalone file
    cnt = np.bincount(op[keep], minlength=int(np.asarray(prob.points).shape[0]))
    keep &= cnt[op] >= 2
    cam_used = np.zeros(np.asarray(prob.cam_wxyz).shape[0], bool)
    cam_used[oc[keep]] = True
    pt_used = np.zeros(np.asarray(prob.points).shape[0], bool)
    pt_used[op[keep]] = True
    cam_map = np.cumsum(cam_used) - 1
    pt_map = np.cumsum(pt_used) - 1

    # BAL puts the principal point at the origin (Snavely model has no
    # cx/cy): recenter pixels here so the exported file is self-contained
    intr = np.asarray(prob.intrinsics)
    uv_c = uv - intr[None, 2:4]
    sub = prob._replace(
        cam_wxyz=jnp.asarray(np.asarray(prob.cam_wxyz)[cam_used]),
        cam_t=jnp.asarray(np.asarray(prob.cam_t)[cam_used]),
        points=jnp.asarray(np.asarray(prob.points)[pt_used]),
        intrinsics=jnp.asarray([intr[0], intr[1], 0.0, 0.0], jnp.float32),
        obs_cam=jnp.asarray(cam_map[oc[keep]].astype(np.int32)),
        obs_pt=jnp.asarray(pt_map[op[keep]].astype(np.int32)),
        obs_uv=jnp.asarray(uv_c[keep]),
        obs_w=jnp.ones(int(keep.sum()), jnp.float32),
        cam_fixed=jnp.asarray(np.asarray(prob.cam_fixed)[cam_used]),
    )
    d = problem_to_bal(sub)
    save_bal(path, d)
    return d


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=420)
    ap.add_argument("--width", type=int, default=1240)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/real_structure.bal")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    from dr3_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from tools.run_long_sequence import make_sequence

    from dr3_tpu.pipelines.vo import MonoVO
    from dr3_tpu.utils.config import Config

    rng = np.random.default_rng(11)
    cam, _gt_poses, frames = make_sequence(args.frames, args.width,
                                           args.height, rng,
                                           profile="forward")
    cfg = Config(fast_threshold=8.0, init_min_features=60,
                 init_min_tracked=50, init_min_triangulated=30,
                 init_min_disparity=2.0, kf_disparity=12.0,
                 cell_size=20,  # denser corner grid than the VO default:
                 # the export wants landmark COUNT (BAL problem-93 scale)
                 loop_closure=True, loop_db_capacity=256,
                 loop_min_gap_frames=10 ** 9,  # db = archive only: no
                 # closure rewrites, the exported problem keeps raw drift
                 frames_per_dispatch=16, scan_transfer_uint8=False)
    vo = MonoVO(cam, cfg)
    t0 = time.perf_counter()
    vo.process_batch(frames)
    dt = time.perf_counter() - t0
    if vo.db_cursor < 3:
        print(json.dumps({"error": "VO produced too few keyframes",
                          "keyframes": vo.kf_count,
                          "db": vo.db_cursor}))
        return 1

    d = export_bal(vo, args.out)
    n_cams, n_pts, n_obs = (d.cam_params.shape[0], d.points.shape[0],
                            d.obs_cam.shape[0])

    # round-trip: load + solve the exact Snavely objective, both paths
    from dr3_tpu.ba.snavely import bal_to_snavely, bundle_adjust_snavely
    from dr3_tpu.io.bal import load_bal

    d2 = load_bal(args.out)
    sp = bal_to_snavely(d2)
    # parity compares the SOLVERS, so the PCG inner solve runs near-exact
    # (cg_tol=1e-5, q_eta=0 — the solver docstring's own instruction for
    # fixed-LM-budget parity callers; the loose default forcing trades
    # per-step exactness for wall clock and needs more OUTER iterations,
    # which showed up as a 19%-at-10-iters / 5.9%-at-30-iters cost gap on
    # this ill-conditioned real-structure export)
    res_p = bundle_adjust_snavely(sp, args.iters, huber_delta=2.0,
                                  solver="pcg", cg_iters=200,
                                  cg_tol=1e-5, q_eta=0.0)
    cp0, cp1 = float(res_p.initial_cost), float(res_p.final_cost)
    res_e = bundle_adjust_snavely(sp, args.iters, huber_delta=2.0,
                                  solver="explicit")
    ce1 = float(res_e.final_cost)
    res_z = bundle_adjust_snavely(sp, args.iters, huber_delta=2.0,
                                  solver="zexplicit")
    cz1 = float(res_z.final_cost)

    out = {
        "frames": args.frames,
        "vo_fps": round(args.frames / dt, 2),
        "bal_file": args.out,
        "n_cams": int(n_cams),
        "n_points": int(n_pts),
        "n_obs": int(n_obs),
        "cost_initial": round(cp0, 2),
        "cost_final_pcg": round(cp1, 2),
        "cost_final_explicit": round(ce1, 2),
        "cost_final_zexplicit": round(cz1, 2),
        "cost_per_obs_final": round(cp1 / max(n_obs, 1), 4),
        "paths_agree_pct": round(100.0 * max(abs(cp1 - ce1), abs(cz1 - ce1))
                                 / max(cp1, 1e-9), 2),
    }
    print(json.dumps(out))
    ok = (np.isfinite(cp1) and cp1 <= cp0
          and abs(cp1 - ce1) <= 0.05 * max(cp1, 1e-9)
          and abs(cz1 - ce1) <= 0.05 * max(cp1, 1e-9))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
