"""Device-mesh helpers for row-partitioned sparse linear algebra.

The reference has no distributed layer at all (SURVEY.md §2.3); this is the
north-star capability from BASELINE.json: 1-D row partitioning over a
`jax.sharding.Mesh`, XLA collectives instead of NCCL, `jax.distributed`
for multi-host process setup.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "rows"


def make_row_mesh(n_devices: Optional[int] = None,
                  devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the row axis. Uses all local devices by default."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    # Auto axis type: let the GSPMD partitioner propagate shardings and
    # insert collectives (jax 0.9 defaults to Explicit, which instead
    # demands per-op out_sharding annotations).
    return jax.make_mesh(
        (len(devices),), (ROW_AXIS,),
        devices=list(devices),
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def row_sharding(mesh: Mesh, ndim: int = 1,
                 row_axis_pos: int = 0) -> NamedSharding:
    """Sharding that splits dimension ``row_axis_pos`` across the mesh."""
    spec = [None] * ndim
    spec[row_axis_pos] = ROW_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(**kwargs) -> None:
    """Multi-host process bootstrap (replaces NCCL/MPI init; SURVEY.md §5).
    No-op when running single-process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process
