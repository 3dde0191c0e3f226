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

FORMAT_VERSION = 1


def save_vo(path: str, vo) -> None:
    """Serialize a pipelines.vo.MonoVO to <path>.npz (+ .json header)."""
    arrays: Dict[str, np.ndarray] = {}

    def put(prefix: str, nt):
        for name, val in nt._asdict().items():
            arrays[f"{prefix}.{name}"] = np.asarray(val)

    put("tracks", vo.tracks)
    put("kfs", vo.kfs)
    put("map", vo.map)
    arrays["T_cur"] = np.asarray(vo.T_cur.params())
    arrays["trajectory"] = (np.stack(vo.trajectory)
                            if vo.trajectory else np.zeros((0, 4, 4), np.float32))
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
    vo.trajectory = [t for t in data["trajectory"]]
    vo.stage = Stage[meta["stage"]]
    vo.kf_count = meta["kf_count"]
    vo.point_cursor = meta["point_cursor"]
    vo.frame_idx = meta["frame_idx"]
    vo.last_kf_tracked = meta["last_kf_tracked"]
    vo.pyr_prev = None  # the next frame re-seeds tracking imagery


def _meta_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".json"
