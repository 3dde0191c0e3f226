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
HOST_AXIS = "hosts"    # cross-host (DCN) axis of the 2-level mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = POINT_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(n_hosts: Optional[int] = None,
                 n_devices: Optional[int] = None) -> Mesh:
    """Two-level [hosts, points] mesh (SURVEY §7 config 5): the point/
    observation axis shards over BOTH axes, so collectives reduce first
    over ICI (within a host's devices, the fast inner axis) and then over
    DCN (across hosts) — XLA lowers a single psum over (hosts, points) to
    exactly that hierarchy. Host count defaults to ``jax.process_count()``
    (1 in single-process runs, where the axis still exists for code-path
    parity and the dryrun)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    if len(devs) % n_hosts != 0:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"{n_hosts} hosts")
    grid = np.array(devs).reshape(n_hosts, len(devs) // n_hosts)
    return Mesh(grid, (HOST_AXIS, POINT_AXIS))


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed for multi-host runs.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are omitted (the standard multi-controller launch contract);
    no-ops and returns False in single-process runs so every CLI can call
    it unconditionally."""
    import os

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        pid_env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid_env) if pid_env is not None else None
    if not coordinator or num_processes <= 1 or process_id is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def shard_spec(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
