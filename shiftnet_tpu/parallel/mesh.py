"""Device mesh + sharding helpers.

The reference's distributed runtime is NCCL DDP (``basicsr/utils/
dist_util.py``, ``base_model.py:63-80``).  The TPU-native equivalent is a
``jax.sharding.Mesh`` over all chips with pjit-style sharding annotations;
gradient all-reduce over ICI falls out of the partitioner — no process-group
code.  Multi-host: call ``jax.distributed.initialize()`` once per host before
building the mesh (handled in ``init_distributed``).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> None:
    """Initialize multi-host JAX if running under a multi-process launcher
    (no-op single-host).  Mirrors ``init_dist`` (``dist_util.py:17-65``) but
    via JAX's coordination service instead of NCCL process groups."""
    import os
    if 'JAX_COORDINATOR_ADDRESS' in os.environ or 'MEGASCALE_COORDINATOR_ADDRESS' in os.environ:
        jax.distributed.initialize()


def make_mesh(data: int | None = None, time: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'time') mesh.  ``data=None`` uses all devices / time."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        assert n % time == 0, (n, time)
        data = n // time
    assert data * time == n, (data, time, n)
    return Mesh(devices.reshape(data, time), ('data', 'time'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across 'data'."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_primary() -> bool:
    return jax.process_index() == 0
