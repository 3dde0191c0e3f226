"""Per-kernel TPU timing via on-device lax.scan loops.

Per-call synced timing is meaningless through the remote relay (~50-300 ms
round trip) and async dispatch without a host fetch measures nothing. The
only clean method: run the kernel N times inside ONE jitted lax.scan over
stacked inputs, force with a scalar host fetch, and difference two loop
lengths so the relay round trip cancels:

    kernel_ms = (T(n2) - T(n1)) / (n2 - n1)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N1, N2 = 16, 128


def scan_time(fn, stacked_inputs, n, repeats=3):
    """Median wall time of one jitted scan of `fn` over n stacked inputs."""
    import jax
    import jax.numpy as jnp

    sliced = jax.tree.map(lambda a: a[:n], stacked_inputs)

    @jax.jit
    def loop(xs):
        def body(c, x):
            out = fn(x)
            leaves = [l.astype(jnp.float32).sum() for l in jax.tree.leaves(out)]
            return c + sum(leaves), None

        c, _ = jax.lax.scan(body, jnp.zeros(()), xs)
        return c

    float(loop(sliced))  # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(sliced))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def kernel_ms(fn, stacked_inputs, label):
    t1 = scan_time(fn, stacked_inputs, N1)
    t2 = scan_time(fn, stacked_inputs, N2)
    ms = (t2 - t1) / (N2 - N1) * 1e3
    print(f"{label:28s} {ms:8.3f} ms/call")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from dr3_tpu.ops import corners, lk, pyramid, warp
    from dr3_tpu.utils.config import Config

    cfg = Config()
    h, w = 376, 1240
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (N2, h, w)).astype(np.float32))

    kernel_ms(lambda im: tuple(pyramid.build_pyramid(im, cfg.klt_levels)),
              imgs, "pyramid (4 lvl)")

    kernel_ms(lambda im: corners.detect_features(
        pyramid.build_pyramid(im, cfg.n_pyr_levels), cfg.cell_size,
        cfg.min_corner_score, cfg.fast_threshold),
        imgs, "detect FAST+NMS+ST (3 lvl)")

    n_tracks = 546
    px = jnp.asarray(rng.uniform([20, 20], [w - 20, h - 20],
                                 (n_tracks, 2)).astype(np.float32))
    valid = jnp.ones((n_tracks,), bool)
    base = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    pyr_prev = pyramid.build_pyramid(base, cfg.klt_levels)

    def lk_call(im):
        pyr_next = pyramid.build_pyramid(im, cfg.klt_levels)
        r = lk.track_pyramid_auto(pyr_prev, pyr_next, px, valid,
                                  half_window=cfg.klt_window // 2,
                                  iters=cfg.klt_iters, eps=cfg.klt_eps)
        return (r.pos, r.err)

    kernel_ms(lk_call, imgs, "pyramid+LK (4 lvl, 10 it)")

    # the *_auto dispatchers decide pallas-vs-XLA capacity concretely on the
    # host, so they can't trace inside the scan — time the kernels directly
    from dr3_tpu.ops.pallas import warp_pallas

    Hm = jnp.asarray([[1.0, 0.01, 5.0], [-0.01, 1.0, 3.0], [1e-5, 0, 1.0]])
    kernel_ms(lambda im: warp_pallas.warp_perspective(im, Hm, (h, w))[0],
              imgs, "warp_perspective (pallas)")
    kernel_ms(lambda im: warp_pallas.warp_spherical(im, 700.0),
              imgs, "warp_spherical (pallas)")


if __name__ == "__main__":
    main()
