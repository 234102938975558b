"""Device-mesh and sharding helpers — the TPU-native replacement for the
reference's NCCL/DDP backend (`basicsr/utils/dist_util.py`, SURVEY.md §2.9 #3).

Parallelism model (matches and extends SURVEY.md §2.10):
  * data axis ('data'): batch-sharded training, params replicated; gradient
    averaging happens inside jit via XLA all-reduce — no explicit NCCL calls.
  * Multi-host: `jax.distributed.initialize()` once per process; device
    meshes span all hosts transparently (collectives ride ICI within a
    slice, DCN across).

The model is small (1.5M params) so tensor/pipeline parallelism is not
useful; the scaling axes are data and (for UHD frames) spatial tiling.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D mesh over the first n devices (default: all local devices)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch arrays: shard dim 0 over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with leading dim sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
