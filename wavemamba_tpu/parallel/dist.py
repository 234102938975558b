"""Multi-host process helpers — replaces `basicsr/utils/dist_util.py`.

  * init_dist (`dist_util.py:10-57`, NCCL/SLURM)  -> `initialize()` below
    (jax.distributed; coordinator/env handling is JAX's, incl. SLURM).
  * get_dist_info (`dist_util.py:60-71`)          -> `get_dist_info()`
  * master_only (`dist_util.py:74-82`)            -> `master_only` decorator
    (rank-0 == process_index 0).
"""

from __future__ import annotations

import functools

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX. Safe to call when single-process (no-op)."""
    if num_processes is None and coordinator_address is None:
        # Single-host (including single TPU VM with all local devices).
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def get_dist_info():
    """(rank, world_size) in process terms."""
    return jax.process_index(), jax.process_count()


def is_master() -> bool:
    return jax.process_index() == 0


def master_only(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_master():
            return fn(*args, **kwargs)

    return wrapper
