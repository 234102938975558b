"""Filesystem / misc helpers (`basicsr/utils/misc.py`)."""

from __future__ import annotations

import os
import random
import time

import numpy as np


def set_random_seed(seed: int):
    """Seed python/numpy (JAX randomness is explicit via PRNG keys;
    the training loop derives its key from the same seed)."""
    random.seed(seed)
    np.random.seed(seed)


def get_time_str():
    return time.strftime("%Y%m%d_%H%M%S", time.localtime())


def mkdir_and_rename(path: str):
    """If path exists, archive it with a timestamp suffix, then mkdir
    (`misc.py:25-36`)."""
    if os.path.exists(path):
        new_name = path + "_archived_" + get_time_str()
        print(f"Path already exists. Rename it to {new_name}", flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def make_exp_dirs(opt: dict, archive: bool = True):
    """Create experiment directory tree (`misc.py:39-50`).

    archive=False skips the rename-with-timestamp of an existing root —
    used when resuming into an existing experiment (the reference only
    archives when starting fresh: `basicsr/train.py:130-136` calls
    make_exp_dirs solely under `if resume_state is None`)."""
    path_opt = dict(opt["path"])
    root = path_opt.pop("experiments_root" if opt.get("is_train") else "results_root")
    if archive:
        mkdir_and_rename(root)
    else:
        os.makedirs(root, exist_ok=True)
    for key, path in path_opt.items():
        if ("strict_load" in key) or ("pretrain_network" in key) or ("resume" in key) or (
            "param_key" in key
        ):
            continue
        if isinstance(path, str):
            os.makedirs(path, exist_ok=True)


def scandir(dir_path, suffix=None, recursive=False, full_path=False):
    """Generator over file paths (`misc.py:53-93`)."""
    if (suffix is not None) and not isinstance(suffix, (str, tuple)):
        raise TypeError('"suffix" must be a string or tuple of strings')
    root = dir_path

    def _scandir(dir_path, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith(".") and entry.is_file():
                if full_path:
                    return_path = entry.path
                else:
                    return_path = os.path.relpath(entry.path, root)
                if (suffix is None) or return_path.endswith(suffix):
                    yield return_path
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix=suffix, recursive=recursive)

    return _scandir(dir_path, suffix=suffix, recursive=recursive)


def check_resume(opt: dict, resume_iter: int):
    """Point pretrain paths at the resume-state iteration's weights
    (`misc.py:137-168`)."""
    if not opt["path"].get("resume_state"):
        return
    networks = [k for k in opt.keys() if k.startswith("network_")]
    flag_pretrain = any(
        opt["path"].get(f"pretrain_{n}") is not None for n in networks
    )
    if flag_pretrain:
        print("pretrain_network path will be ignored during resuming.", flush=True)
    for network in networks:
        name = f"pretrain_{network}"
        basename = network.replace("network_", "")
        if opt.get("ignore_resume_networks") is None or (
            network not in opt["ignore_resume_networks"]
        ):
            # Our snapshots are Orbax directories named `net_<x>_<iter>`
            # (train/checkpoint.py:save_network), not the reference's
            # `net_<x>_<iter>.pth` files — point at what save_network wrote
            # so the result loads with load_network.
            opt["path"][name] = os.path.join(
                opt["path"]["models"], f"net_{basename}_{resume_iter}"
            )


def sizeof_fmt(size, suffix="B"):
    for unit in ["", "K", "M", "G", "T", "P", "E", "Z"]:
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"
