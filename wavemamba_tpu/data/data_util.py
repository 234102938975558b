"""Path-pairing utilities (`basicsr/data/data_util.py`)."""

from __future__ import annotations

import os

from wavemamba_tpu.utils.misc import scandir


def paired_paths_from_folder(folders, keys, filename_tmpl="{}"):
    """Pair files from an LQ folder and a GT folder by stem
    (`data_util.py:208-256`)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    input_paths = list(scandir(input_folder))
    gt_paths = list(scandir(gt_folder))
    assert len(input_paths) == len(gt_paths), (
        f"{input_key} and {gt_key} datasets have different number of images: "
        f"{len(input_paths)}, {len(gt_paths)}."
    )
    paths = []
    for gt_path in sorted(gt_paths):
        basename, ext = os.path.splitext(os.path.basename(gt_path))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        input_path = os.path.join(input_folder, input_name)
        assert input_name in [os.path.basename(p) for p in input_paths], (
            f"{input_name} is not in {input_key}_paths."
        )
        gt_path = os.path.join(gt_folder, gt_path)
        paths.append({f"{input_key}_path": input_path, f"{gt_key}_path": gt_path})
    return paths


def paired_paths_from_meta_info_file(folders, keys, meta_info_file, filename_tmpl="{}"):
    """Pair from a meta-info text file of GT names (`data_util.py:158-205`)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    with open(meta_info_file, "r") as fin:
        gt_names = [line.strip().split(" ")[0] for line in fin]
    paths = []
    for gt_name in gt_names:
        basename, ext = os.path.splitext(os.path.basename(gt_name))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        paths.append(
            {
                f"{input_key}_path": os.path.join(input_folder, input_name),
                f"{gt_key}_path": os.path.join(gt_folder, gt_name),
            }
        )
    return paths


def paired_paths_from_lmdb(folders, keys):
    """Pair from two lmdb folders via their meta_info.txt (`data_util.py:92-155`)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    if not (input_folder.endswith(".lmdb") and gt_folder.endswith(".lmdb")):
        raise ValueError(
            f"{input_key} folder and {gt_key} folder should both in lmdb formats. "
            f"But received {input_key}: {input_folder}; {gt_key}: {gt_folder}"
        )
    with open(os.path.join(input_folder, "meta_info.txt")) as fin:
        input_lmdb_keys = [line.split(".")[0] for line in fin]
    with open(os.path.join(gt_folder, "meta_info.txt")) as fin:
        gt_lmdb_keys = [line.split(".")[0] for line in fin]
    if set(input_lmdb_keys) != set(gt_lmdb_keys):
        raise ValueError(f"Keys in {input_key}_folder and {gt_key}_folder are different.")
    return [
        {f"{input_key}_path": k, f"{gt_key}_path": k} for k in sorted(input_lmdb_keys)
    ]


def paths_from_folder(folder):
    return [os.path.join(folder, p) for p in sorted(scandir(folder))]


def paths_from_lmdb(folder):
    if not folder.endswith(".lmdb"):
        raise ValueError(f"Folder {folder} should be in lmdb format.")
    with open(os.path.join(folder, "meta_info.txt")) as fin:
        return [line.split(".")[0] for line in fin]
