"""Monocular SLAM runner (reference tests/slam/test_slam.cc +
tests/test_pipeline.cpp + scripts/slam.sh equivalents).

    python -m dr3_tpu.run_slam --seq /path/to/kitti/00 --out results/
    python -m dr3_tpu.run_slam                 # 10-frame fixture sequence
    python -m dr3_tpu.run_slam --distributed   # local BA over all devices

Writes trajectory (TUM format), the map rendering PNG, a checkpoint, and
prints the per-stage Monitor report (SLAM::pprint parity).
"""

from __future__ import annotations

# direct-script invocation (python dr3_tpu/run_X.py) from any cwd: put the
# repo root on sys.path so the package imports resolve
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seq", default=None,
                    help="KITTI odometry sequence dir (image_0/ + times.txt); "
                         "defaults to the checked-in 10-frame fixture")
    ap.add_argument("--out", default="results")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--distributed", action="store_true",
                    help="shard local BA over all visible devices")
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--resume", default=None, help="checkpoint path to resume")
    ap.add_argument("--loop-closure", action="store_true",
                    help="(default since round 4; kept for compatibility)")
    ap.add_argument("--no-loop-closure", action="store_true",
                    help="disable place recognition + pose-graph closure")
    ap.add_argument("--global-ba", action="store_true",
                    help="offline global BA over all keyframes after the run "
                         "(implies loop closure)")
    ap.add_argument("--batch", type=int, default=16,
                    help="frames per device dispatch (device-resident scan "
                         "loop with speculative pipelining; 1 = per-frame "
                         "with per-frame stats printing)")
    args, unknown = ap.parse_known_args(argv)


    from dr3_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from dr3_tpu.parallel.mesh import distributed_init

    distributed_init()  # multi-host launch contract (no-op single-process)

    from dr3_tpu.io.kitti import open_fixture_sequence, open_sequence
    from dr3_tpu.pipelines.vo import MonoVO
    from dr3_tpu.utils.config import Config

    cfg = Config.from_cli(unknown)  # --cell_size=30 style overrides
    if args.loop_closure or args.global_ba:
        cfg = cfg.replace(loop_closure=True)
    if args.no_loop_closure and not args.global_ba:
        cfg = cfg.replace(loop_closure=False)
    cfg = cfg.replace(frames_per_dispatch=args.batch)
    seq = open_sequence(args.seq) if args.seq else open_fixture_sequence()
    mesh = None
    if args.distributed:
        import jax

        from dr3_tpu.parallel.mesh import make_mesh, make_mesh_2d

        # 2-level [hosts, points] mesh when multiple processes participate
        # (map shards over ICI within a host, reduced systems combine over
        # DCN); flat mesh on one host
        if jax.process_count() > 1:
            mesh = make_mesh_2d()
        else:
            mesh = make_mesh()
    vo = MonoVO(seq.cam, cfg, mesh=mesh)
    if args.resume:
        from dr3_tpu.io.checkpoint import load_vo

        load_vo(args.resume, vo)

    os.makedirs(args.out, exist_ok=True)
    batched = args.batch > 1 and mesh is None
    chunk: list = []

    def flush_chunk():
        if not chunk:
            return
        n0 = len(vo.stats)
        vo.process_batch(chunk)
        for s in vo.stats[n0:]:
            print(f"[{s.frame_id:05d}] {s.stage:<10} "
                  f"tracked={s.n_tracked:4d} inliers={s.n_inliers:4d} "
                  f"kf={int(s.is_keyframe)} map={s.n_map_points}",
                  flush=True)
        chunk.clear()

    for i, frame in enumerate(seq):
        if args.max_frames and i >= args.max_frames:
            break
        if batched:
            chunk.append(frame)
            if len(chunk) >= 4 * args.batch:
                flush_chunk()
        else:
            vo.process(frame)
            s = vo.stats[-1]
            print(f"[{i:05d}] {s.stage:<10} tracked={s.n_tracked:4d} "
                  f"inliers={s.n_inliers:4d} kf={int(s.is_keyframe)} "
                  f"map={s.n_map_points}", flush=True)
        if args.checkpoint_every and (i + 1) % args.checkpoint_every == 0:
            flush_chunk()
            from dr3_tpu.io.checkpoint import save_vo

            save_vo(os.path.join(args.out, "checkpoint"), vo)
    flush_chunk()

    if args.global_ba:
        costs = vo.global_refine()
        if costs is not None:
            print(f"global BA: cost {costs[0]:.3f} -> {costs[1]:.3f}")
        else:
            print("global BA skipped: fewer than 3 keyframes in the database")

    print(vo.report())

    # trajectory in TUM format (timestamp tx ty tz qx qy qz qw)
    traj_path = os.path.join(args.out, "trajectory.txt")
    with open(traj_path, "w") as f:
        from dr3_tpu.geometry.lie import matrix_to_quat
        import jax.numpy as jnp

        times = seq.times if seq.times is not None else np.arange(len(vo.trajectory))
        for t, T in zip(times, vo.trajectory):
            R = T[:3, :3]
            c = -R.T @ T[:3, 3]
            q = np.asarray(matrix_to_quat(jnp.asarray(R.T)))  # world->cam inv
            f.write(f"{t:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                    f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")
    print("wrote", traj_path)

    from dr3_tpu.viz.draw3d import render_vo

    png = render_vo(vo, os.path.join(args.out, "slam_map.png"))
    print("wrote", png)

    from dr3_tpu.io.checkpoint import save_vo

    save_vo(os.path.join(args.out, "final"), vo)
    print("wrote", os.path.join(args.out, "final.npz"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
