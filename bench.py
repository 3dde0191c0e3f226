"""Benchmark: monocular VO front-end throughput on KITTI-sized frames.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: frames/sec/chip of the fused VO tracking step (image pyramid +
pyramidal LK over the full track table + motion-only pose Gauss-Newton) at
KITTI resolution 1240x376, cycling the ten KITTI frames checked into the
reference repo. This is the per-frame hot path of the SLAM pipeline
(reference SLAM prints the same FPS statistic, src/slam.cpp:49-84).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
anchor is the KITTI capture rate — 10 frames/sec — i.e. vs_baseline = x
means x-times real-time. The reference's own qualitative claim is roughly
real-time tracking on CPU without BA.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import entry

    from dr3_tpu.io.kitti import open_fixture_sequence

    step, args = entry()
    step = jax.jit(step)

    # real frames if available, else the synthetic example args
    try:
        seq = open_fixture_sequence()
        frames = [jnp.asarray(f) for f in
                  (np.asarray(x, np.float32) for x in
                   ([seq.frame(i) for i in range(len(seq))]))]
    except Exception:
        frames = [args[0], args[1]]
    if len(frames) < 2:
        frames = [args[0], args[1]]

    (pyr_prev, img_cur, track_px, track_valid, track_point,
     map_xyz, map_valid, pose_wxyz, pose_t) = args

    # warmup / compile (the step consumes the previous frame's pyramid and
    # returns the current one — one pyramid build per frame, like the
    # pipeline driver)
    out = step(pyr_prev, frames[0], track_px, track_valid, track_point,
               map_xyz, map_valid, pose_wxyz, pose_t)
    jax.block_until_ready(out)

    # enough async dispatches to amortize the remote-relay latency of the
    # first few steps (30 iters measures pipeline fill, not throughput)
    n_iters = int(os.environ.get("BENCH_FRAMES", "120"))
    t0 = time.perf_counter()
    pyr = out[0]
    px, valid = track_px, track_valid
    for i in range(n_iters):
        b = frames[(i + 1) % len(frames)]
        out = step(pyr, b, px, valid, track_point, map_xyz, map_valid,
                   pose_wxyz, pose_t)
        pyr = out[0]
        px = out[1]
        # keep the track table full and in-frame so every frame does
        # identical work
        px = jnp.clip(px, jnp.asarray([25.0, 25.0]),
                      jnp.asarray([1240.0 - 25.0, 376.0 - 25.0]))
        valid = track_valid
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = n_iters / dt
    print(json.dumps({
        "metric": "vo_frontend_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s (KITTI 1240x376; pyramid+LK+pose-GN)",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
