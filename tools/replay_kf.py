"""Replay captured keyframe-step inputs (DR3_DUMP_KF) against individual
keyframe-stage programs on the current platform — isolates a TPU worker
crash to a stage and discriminates input-dependent faults from
process-context-dependent ones.

    # capture (crashes at the faulty dispatch, dump survives):
    DR3_DUMP_KF=/tmp/kf python tools/run_long_sequence.py --kitti-res \
        --no-fused --sync --frames 40
    # replay one stage in a fresh process:
    python tools/replay_kf.py /tmp/kf_posttri.npz --stage spawn
    # replay after pre-loading/running the other hot programs first
    # (tests whether the fault needs a "warm" worker):
    python tools/replay_kf.py /tmp/kf_posttri.npz --stage spawn --warm
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dump")
    ap.add_argument("--stage", default="spawn",
                    choices=["spawn", "triangulate", "fused", "patches",
                             "occupancy", "detect", "rank_scatter",
                             "spawn_nodetect", "bigxla", "detect_xla"])
    ap.add_argument("--warm", action="store_true",
                    help="run the VO front-end programs (pyramid+LK+pose GN) "
                         "before the replayed stage, mimicking in-run state")
    ap.add_argument("--warm-lk", action="store_true",
                    help="warm-up = pyramidal LK only")
    ap.add_argument("--warm-pose", action="store_true",
                    help="warm-up = pose GN only")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from dr3_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    log(f"platform: {jax.devices()}")

    from dr3_tpu.geometry.lie import SE3
    from dr3_tpu.models.camera import Pinhole
    from dr3_tpu.ops import lk
    from dr3_tpu.pipelines import vo
    from dr3_tpu.state import KeyframeState, MapState, TrackState
    from dr3_tpu.utils.config import Config

    z = np.load(args.dump)
    pyr = [jnp.asarray(z[f"pyr{i}"]) for i in range(8) if f"pyr{i}" in z]
    tracks = TrackState(**{k: jnp.asarray(z[f"tr_{k}"])
                           for k in TrackState._fields})
    kfs = KeyframeState(**{k: jnp.asarray(z[f"kf_{k}"])
                           for k in KeyframeState._fields})
    mp = MapState(xyz=jnp.asarray(z["map_xyz"]),
                  valid=jnp.asarray(z["map_valid"]))
    T = SE3(jnp.asarray(z["T_wxyz"]), jnp.asarray(z["T_t"]))
    cursor = int(z["cursor"])
    slot = int(z["slot"])
    h, w = pyr[0].shape
    cfg = Config(fast_threshold=8.0)  # run_long_sequence's detect config
    f = 0.875 * w
    cam = Pinhole.create(w, h, f, f, w / 2.0, h / 2.0)
    log(f"dump: {len(pyr)} pyr levels, {tracks.px.shape[0]} tracks, "
        f"img {h}x{w}, cursor={cursor}, slot={slot}")
    finite = np.isfinite(np.asarray(tracks.px)).all(-1)
    log(f"track px finite: {finite.sum()}/{len(finite)}; "
        f"valid: {int(np.asarray(tracks.valid).sum())}")

    if args.warm or args.warm_lk:
        log("warm-up: pyramidal LK on the dump's own imagery")
        res = lk.track_pyramid_auto(pyr[:4], pyr[:4], tracks.px, tracks.valid,
                                    half_window=cfg.klt_window // 2,
                                    iters=cfg.klt_iters, eps=cfg.klt_eps)
        jax.block_until_ready(res.pos)
        log("warm-up LK done")
    if args.warm or args.warm_pose:
        T2, inl, n = vo._pose_optimize(tracks, mp.xyz, mp.valid, T, cam, cfg)
        jax.block_until_ready(T2.t)
        log("warm-up pose GN done")

    for rep in range(args.repeat):
        if args.stage == "spawn":
            tr, n_sp = vo._spawn_tracks(pyr, tracks, cfg,
                                        jnp.asarray(slot, jnp.int32), (h, w))
            jax.block_until_ready(tr.px)
            log(f"rep{rep}: _spawn_tracks OK (spawned={int(n_sp)})")
        elif args.stage == "triangulate":
            tr, m2, cur, n_new = vo._triangulate_new(
                tracks, kfs, T, mp, jnp.asarray(cursor, jnp.int32), cam, cfg)
            jax.block_until_ready(m2.xyz)
            log(f"rep{rep}: _triangulate_new OK (new={int(n_new)})")
        elif args.stage == "fused":
            out = vo._keyframe_step(pyr, tracks, kfs, T, mp,
                                    jnp.asarray(cursor, jnp.int32), cam, cfg,
                                    jnp.asarray(slot, jnp.int32), (h, w))
            jax.block_until_ready(out[0].px)
            st = np.asarray(out[2])
            log(f"rep{rep}: _keyframe_step OK (new={int(st[1])}, "
                f"spawned={int(st[2])})")
        elif args.stage == "patches":
            half = (tracks.ref_patch.shape[-1] - 1) // 2
            fresh = lk.extract_patches(pyr[0], tracks.px, half)
            jax.block_until_ready(fresh)
            log(f"rep{rep}: extract_patches OK")
        elif args.stage == "occupancy":
            from dr3_tpu.ops import corners
            occ = corners.make_occupancy(tracks.px, tracks.valid, (h, w),
                                         cfg.cell_size)
            jax.block_until_ready(occ)
            log(f"rep{rep}: make_occupancy OK (occ={int(np.asarray(occ).sum())})")
        elif args.stage == "detect":
            feats = vo._detect(pyr, cfg)
            jax.block_until_ready(feats.xy)
            log(f"rep{rep}: _detect OK (n={int(feats.n)})")
        elif args.stage == "rank_scatter":
            # the slot-rank allocation scatters of _spawn_tracks, alone
            @jax.jit
            def ranks(valid):
                n = valid.shape[0]
                free = ~valid
                free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
                scatter_idx = jnp.where(free, free_rank, n)
                slot_of_rank = jnp.full((n,), -1, jnp.int32).at[
                    scatter_idx].set(jnp.arange(n, dtype=jnp.int32),
                                     mode="drop")
                return slot_of_rank

            out = ranks(tracks.valid)
            jax.block_until_ready(out)
            log(f"rep{rep}: rank_scatter OK")
        elif args.stage == "spawn_nodetect":
            # _spawn_tracks body with the detect result replaced by a
            # constant GridCorners — isolates occupancy+scatters+patches
            from dr3_tpu.ops.corners import GridCorners, make_occupancy

            n = tracks.px.shape[0]

            @jax.jit
            def body(pyr0, tracks_):
                occ = make_occupancy(tracks_.px, tracks_.valid, (h, w),
                                     cfg.cell_size)
                xy = jnp.stack(
                    [jnp.linspace(20.0, w - 20.0, n),
                     jnp.linspace(20.0, h - 20.0, n)], -1)
                feats = GridCorners(xy=xy.astype(jnp.float32),
                                    level=jnp.zeros((n,), jnp.int32),
                                    score=jnp.ones((n,), jnp.float32),
                                    valid=~occ[:n] if occ.shape[0] >= n
                                    else jnp.ones((n,), bool))
                free = ~tracks_.valid
                free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
                scatter_idx = jnp.where(free, free_rank, n)
                slot_of_rank = jnp.full((n,), -1, jnp.int32).at[
                    scatter_idx].set(jnp.arange(n, dtype=jnp.int32),
                                     mode="drop")
                new_rank = jnp.cumsum(feats.valid.astype(jnp.int32)) - 1
                n_free = jnp.sum(free.astype(jnp.int32))
                can_place = feats.valid & (new_rank < n_free)
                dest = jnp.where(can_place,
                                 slot_of_rank[jnp.clip(new_rank, 0, n - 1)],
                                 -1)
                dest_safe = jnp.where(dest >= 0, dest, 0)
                place = dest >= 0
                half = (tracks_.ref_patch.shape[-1] - 1) // 2
                patches = lk.extract_patches(pyr0, feats.xy, half)
                px2 = tracks_.px.at[dest_safe].set(
                    jnp.where(place[:, None], feats.xy,
                              tracks_.px[dest_safe]))
                pat2 = tracks_.ref_patch.at[dest_safe].set(
                    jnp.where(place[:, None, None], patches,
                              tracks_.ref_patch[dest_safe]))
                return px2, pat2, jnp.sum(place.astype(jnp.int32))

            px2, pat2, n_sp = body(pyr[0], tracks)
            jax.block_until_ready(px2)
            log(f"rep{rep}: spawn_nodetect OK (placed={int(n_sp)})")
        elif args.stage == "bigxla":
            # a generic LARGE dense XLA program at image scale (no pallas,
            # no scatter/gather): discriminates "any big program after LK
            # crashes" from "spawn-specific construct crashes"
            @jax.jit
            def big(img):
                x = img * 255.0
                acc = jnp.zeros_like(x)
                for k in range(16):
                    sh = jnp.roll(x, k + 1, axis=1) - jnp.roll(x, -(k + 1), 0)
                    acc = acc + jnp.tanh(sh * 0.1) * jnp.exp(-0.01 * jnp.abs(sh))
                up = jnp.repeat(jnp.repeat(acc[::2, ::2], 2, 0), 2, 1)
                return jnp.sum(acc) + jnp.sum(up)

            out = big(pyr[0])
            jax.block_until_ready(out)
            log(f"rep{rep}: bigxla OK ({float(out):.1f})")
        elif args.stage == "detect_xla":
            # detect_features through the jnp oracle (DR3_DETECT_BACKEND=xla
            # must be set by the caller for this to differ from 'detect')
            feats = vo._detect(pyr, cfg)
            jax.block_until_ready(feats.xy)
            log(f"rep{rep}: detect(backend=env) OK (n={int(feats.n)})")
    log("REPLAY PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
