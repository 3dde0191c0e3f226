"""Checkpoint / resume for SLAM state.

The reference has no persistence beyond saving result images (SURVEY §5:
"Checkpoint / resume: none"). Here the whole world state — keyframe ring,
landmark map, track table, trajectory, cursors — serializes to a single
``.npz`` plus a JSON header, because the state is already flat arrays
(state.py). Restoring mid-sequence resumes VO exactly where it stopped;
multi-host restart reloads the same file on every host (state is replicated
below the BA shard level).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from dr3_tpu.geometry.lie import SE3
from dr3_tpu.state import KeyframeState, MapState, TrackState

FORMAT_VERSION = 2


def save_vo(path: str, vo) -> None:
    """Serialize a pipelines.vo.MonoVO to <path>.npz (+ .json header).

    Format 2 (round 4) additionally persists the loop-closure state (the
    keyframe database, accepted loop edges, cursors) and the LOCAL
    trajectory + relocalization anchor — without them a post-resume loop
    closure would index absolute frame ids into a truncated
    ``_traj_local`` and silently mis-correct the pre-resume trajectory."""
    arrays: Dict[str, np.ndarray] = {}

    def put(prefix: str, nt):
        for name, val in nt._asdict().items():
            arrays[f"{prefix}.{name}"] = np.asarray(val)

    put("tracks", vo.tracks)
    put("kfs", vo.kfs)
    put("map", vo.map)
    arrays["T_cur"] = np.asarray(vo.T_cur.params())
    arrays["T_anchor"] = np.asarray(vo.T_anchor.params())
    arrays["trajectory"] = (np.stack(vo.trajectory)
                            if vo.trajectory else np.zeros((0, 4, 4), np.float32))
    arrays["traj_local"] = (np.stack(vo._traj_local)
                            if vo._traj_local else np.zeros((0, 4, 4),
                                                            np.float32))
    if vo.loop_db is not None:
        put("loop_db", vo.loop_db)
        E = len(vo.loop_edges)
        arrays["loop_edge_ij"] = np.asarray(
            [[i, j] for (i, j, _q, _t) in vo.loop_edges],
            np.int32).reshape(E, 2)
        arrays["loop_edge_q"] = (np.stack([q for (_i, _j, q, _t)
                                           in vo.loop_edges])
                                 if E else np.zeros((0, 4), np.float32))
        arrays["loop_edge_t"] = (np.stack([t for (_i, _j, _q, t)
                                           in vo.loop_edges])
                                 if E else np.zeros((0, 3), np.float32))
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz",
                        **arrays)
    meta = {
        "format_version": FORMAT_VERSION,
        "stage": vo.stage.name,
        "kf_count": vo.kf_count,
        "point_cursor": vo.point_cursor,
        "frame_idx": vo.frame_idx,
        "last_kf_tracked": vo.last_kf_tracked,
        "n_tracks": vo.n_tracks,
        "lost_count": vo.lost_count,
        "db_cursor": vo.db_cursor,
        "last_loop_kf": vo.last_loop_kf,
        "has_loop_db": vo.loop_db is not None,
        "n_loop_closures": vo.n_loop_closures,
        "n_relocalizations": vo.n_relocalizations,
        "n_compactions": vo.n_compactions,
        "n_db_compactions": vo.n_db_compactions,
    }
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f, indent=2)


def load_vo(path: str, vo) -> None:
    """Restore a MonoVO in place from a checkpoint written by save_vo."""
    npz_path = path if path.endswith(".npz") else path + ".npz"
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta.get('format_version')}")
    if meta["n_tracks"] != vo.n_tracks:
        raise ValueError("checkpoint track capacity does not match pipeline")
    data = np.load(npz_path)

    def get(prefix: str, cls):
        return cls(**{name: jnp.asarray(data[f"{prefix}.{name}"])
                      for name in cls._fields})

    from dr3_tpu.pipelines.vo import Stage

    vo.tracks = get("tracks", TrackState)
    vo.kfs = get("kfs", KeyframeState)
    vo.map = get("map", MapState)
    vo.T_cur = SE3.from_params(jnp.asarray(data["T_cur"]))
    vo.T_anchor = SE3.from_params(jnp.asarray(data["T_anchor"]))
    vo.trajectory = [t for t in data["trajectory"]]
    vo._traj_local = [t for t in data["traj_local"]]
    vo.stage = Stage[meta["stage"]]
    vo.kf_count = meta["kf_count"]
    vo.point_cursor = meta["point_cursor"]
    vo.frame_idx = meta["frame_idx"]
    vo.last_kf_tracked = meta["last_kf_tracked"]
    vo.lost_count = meta["lost_count"]
    vo.db_cursor = meta["db_cursor"]
    vo.last_loop_kf = meta["last_loop_kf"]
    vo.n_loop_closures = meta["n_loop_closures"]
    vo.n_relocalizations = meta["n_relocalizations"]
    vo.n_compactions = meta["n_compactions"]
    vo.n_db_compactions = meta["n_db_compactions"]
    if meta["has_loop_db"]:
        from dr3_tpu.pipelines.loop_closure import LoopDatabase

        if vo.loop_db is None:
            raise ValueError("checkpoint carries a loop database but the "
                             "pipeline has loop_closure disabled")
        vo.loop_db = get("loop_db", LoopDatabase)
        ij = data["loop_edge_ij"]
        vo.loop_edges = [(int(ij[e, 0]), int(ij[e, 1]),
                          data["loop_edge_q"][e], data["loop_edge_t"][e])
                         for e in range(ij.shape[0])]
    vo.pyr_prev = None  # the next frame re-seeds tracking imagery


def _meta_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".json"
