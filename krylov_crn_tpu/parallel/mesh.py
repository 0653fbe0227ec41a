"""Device mesh construction for row-partitioned data parallelism.

The framework distributes over a 1-D mesh axis ("data") holding row shards
of A (SURVEY.md §2.2). Multi-host initialization uses
``jax.distributed.initialize`` when launched across hosts; a CPU fake mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``) exercises the same
code paths on one host.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "DATA_AXIS", "replicated", "row_sharded"]

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices, dtype=object).reshape(-1), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))
