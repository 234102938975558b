"""Checkpoint save/load — Orbax-backed, with reference-parity artifacts.

Two artifact kinds, mirroring `basicsr/models/base_model.py`:
  * Network weights (`save_network` :214-261 / `load_network` :298-324):
    a params pytree saved as `net_g_<iter>` (+ `net_g_latest` alias), loadable
    by name; also imports the reference's `.pth` files via
    `convert/torch_import.py`.
  * Training state (`save_training_state` :326-359 / `resume_training`
    :361-374): the full TrainState (step, params, opt_state, ema) under
    `training_states/<iter>`; auto-resume scans for the highest iter
    (`train.py:99-120`).

Writes are atomic (Orbax writes to a tmp dir and renames), replacing the
reference's retry x3 loop.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_network(params, models_dir: str, net_label: str, current_iter) -> str:
    """Save a params pytree as `<net_label>_<iter>` + refresh `_latest`."""
    if current_iter == -1:
        current_iter = "latest"
    path = os.path.join(os.path.abspath(models_dir), f"{net_label}_{current_iter}")
    ckptr = _checkpointer()
    ckptr.save(path, params, force=True)
    if current_iter != "latest":
        latest = os.path.join(os.path.abspath(models_dir), f"{net_label}_latest")
        ckptr.save(latest, params, force=True)
    return path


def load_network(path: str, template=None):
    """Load a params pytree. `.pth` files go through the torch converter;
    Orbax dirs restore natively (against `template`'s structure if given)."""
    if path.endswith((".pth", ".pt")):
        from wavemamba_tpu.convert.torch_import import load_wavemamba_checkpoint

        return load_wavemamba_checkpoint(path)
    ckptr = _checkpointer()
    path = os.path.abspath(path)
    if template is not None:
        return ckptr.restore(path, item=template)
    # No template: rebuild the tree structure from checkpoint metadata and
    # restore onto the CURRENT default device (the sharding recorded in the
    # checkpoint may reference another platform — e.g. saved on CPU,
    # restored on TPU).
    import jax

    dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    meta_tree = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda m: ocp.ArrayRestoreArgs(sharding=dev), meta_tree
    )
    return ckptr.restore(path, restore_args=restore_args)


def save_training_state(state, states_dir: str, current_iter: int) -> str:
    path = os.path.join(os.path.abspath(states_dir), str(current_iter))
    _checkpointer().save(path, state, force=True)
    return path


def restore_training_state(path: str, template):
    return _checkpointer().restore(os.path.abspath(path), item=template)


def find_resume_state(states_dir: str):
    """Highest-iteration state dir, or None (`train.py:99-120`)."""
    if not os.path.isdir(states_dir):
        return None
    iters = []
    for name in os.listdir(states_dir):
        if re.fullmatch(r"\d+", name) and os.path.isdir(os.path.join(states_dir, name)):
            iters.append(int(name))
    if not iters:
        return None
    return os.path.join(states_dir, str(max(iters)))


def export_to_pth(params, path: str):
    """Export a params pytree back to a reference-compatible `.pth`
    (`{'params': state_dict}` with OIHW/out-in layouts) so checkpoints can
    round-trip to the PyTorch implementation."""
    import torch

    from wavemamba_tpu.convert.torch_export import params_to_state_dict

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in params_to_state_dict(params).items()}
    torch.save({"params": sd}, path)
