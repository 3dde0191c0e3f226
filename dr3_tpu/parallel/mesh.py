"""Device-mesh helpers.

The reference is single-process with zero distributed machinery (SURVEY §2
"Parallelism inventory": one render thread + Ceres' thread pool). All
multi-chip scale here is new design: a 1-D ``jax.sharding.Mesh`` over which
map points / observations shard (the 'sequence' axis of a SLAM problem),
with XLA collectives over ICI as the only communication backend — no
hand-rolled transport.

Keep every collective behind this module so single-chip and N-chip paths
share code (SURVEY §7 "Hard parts").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


POINT_AXIS = "points"  # canonical mesh axis name for map/observation sharding


def make_mesh(n_devices: Optional[int] = None, axis: str = POINT_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_spec(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
