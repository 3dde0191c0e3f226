"""Benchmark: monocular VO front-end throughput on KITTI-sized frames.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: frames/sec/chip of the fused VO tracking step (image pyramid +
pyramidal LK over the full track table + motion-only pose Gauss-Newton) at
KITTI resolution 1240x376, cycling the ten KITTI frames checked into the
reference repo. This is the per-frame hot path of the SLAM pipeline
(reference SLAM prints the same FPS statistic, src/slam.cpp:49-84).

The frame loop runs ON DEVICE as one ``lax.scan`` over a stacked frame
buffer — host dispatch through the remote TPU relay costs ~10 ms/call,
which would measure tunnel latency, not chip throughput. Each scan step
does the identical full tracking step the pipeline driver dispatches:
pyramid build, 4-level Pallas LK over 546 tracks, 10-iteration motion-only
pose LM against a 2048-point map.

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
    from dr3_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from __graft_entry__ import entry

    from dr3_tpu.io.kitti import open_fixture_sequence

    step, args = entry()

    # real frames if available, else the synthetic example args
    try:
        seq = open_fixture_sequence()
        frames = [jnp.asarray(np.asarray(seq.frame(i), np.float32))
                  for i in range(len(seq))]
    except Exception:
        frames = [args[0][0], args[1]]
    if len(frames) < 2:
        frames = [args[0][0], args[1]]
    frame_stack = jnp.stack(frames)  # [F, H, W]

    (pyr_prev, img_cur, track_px, track_valid, track_point,
     map_xyz, map_valid, pose_wxyz, pose_t) = args
    h, w = img_cur.shape
    lo = jnp.asarray([25.0, 25.0])
    hi = jnp.asarray([w - 25.0, h - 25.0])

    n_frames = int(os.environ.get("BENCH_FRAMES", "120"))

    @jax.jit
    def run(frame_stack, pyr0, px0):
        def body(carry, idx):
            pyr, px, wxyz, t = carry
            img = frame_stack[idx % frame_stack.shape[0]]
            out = step(pyr, img, px, track_valid, track_point,
                       map_xyz, map_valid, wxyz, t)
            pyr2, pos = out[0], out[1]
            # keep the track table full and in-frame so every frame does
            # identical work
            px2 = jnp.clip(pos, lo, hi)
            return (pyr2, px2, out[3], out[4]), out[5]
        idxs = jnp.arange(n_frames, dtype=jnp.int32)
        (pyr, px, wxyz, t), costs = jax.lax.scan(
            body, (pyr0, px0, pose_wxyz, pose_t), idxs)
        return px, costs

    # warmup / compile
    out = run(frame_stack, pyr_prev, track_px)
    jax.block_until_ready(out)

    # a few dispatches to amortize relay latency of the scan launch itself
    reps = int(os.environ.get("BENCH_REPS", "10"))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(frame_stack, pyr_prev, track_px)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = reps * n_frames / dt
    print(json.dumps({
        "metric": "vo_frontend_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s (KITTI 1240x376; pyramid+LK+pose-GN)",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
