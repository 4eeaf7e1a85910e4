"""Device mesh construction for the block-parallel pipeline."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, sp: int = 1,
              devices=None) -> Mesh:
    """('dp', 'sp') mesh: blocks shard over dp; within-block width-parallel
    stages shard over sp.  sp=1 collapses to pure DP.

    ``devices`` defaults to the global device list; multi-process callers
    building a host-local mesh must pass ``jax.local_devices()``."""
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    assert n % sp == 0, "sp must divide device count"
    grid = np.array(devices[:n]).reshape(n // sp, sp)
    return Mesh(grid, axis_names=("dp", "sp"))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N) block batches: batch over dp, block dim replicated over sp."""
    return NamedSharding(mesh, P("dp", None))


def length_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
