"""Paired LQ/GT dataset (`basicsr/data/paired_image_dataset.py:18-134`),
NHWC/numpy native (no torch).

Train phase: reflect-pad to gt_size, paired random crop, optional 8-way
dihedral augmentation (`geometric_augs`), RGB float32 HWC output.
Val/test phase: full images. Items: {'lq', 'gt', 'lq_path', 'gt_path'}.
"""

from __future__ import annotations

import numpy as np

from wavemamba_tpu.data.data_util import (
    paired_paths_from_folder,
    paired_paths_from_lmdb,
    paired_paths_from_meta_info_file,
)
from wavemamba_tpu.data.transforms import paired_random_crop, random_augmentation
from wavemamba_tpu.utils.file_client import FileClient
from wavemamba_tpu.utils.img_util import imfrombytes, padding


class PairedImageDataset:
    def __init__(self, opt: dict):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        self.gt_folder, self.lq_folder = opt["dataroot_gt"], opt["dataroot_lq"]
        self.filename_tmpl = opt.get("filename_tmpl", "{}")
        # `cache_in_ram: true` keeps decoded uint8 images in memory after
        # first access (an extension over the reference, which re-decodes
        # every epoch, `paired_image_dataset.py:84-90`): PNG inflate is the
        # dominant cost on few-core hosts (~180 ms per noisy 512^2 image on
        # one core), while a 500-pair 512^2 dataset caches in under 1 GB.
        self._cache = {} if opt.get("cache_in_ram") else None
        self._cache_lock = None
        if self._cache is not None:
            import threading

            self._cache_lock = threading.Lock()

        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = [self.lq_folder, self.gt_folder]
            self.io_backend_opt["client_keys"] = ["lq", "gt"]
            self.paths = paired_paths_from_lmdb(
                [self.lq_folder, self.gt_folder], ["lq", "gt"]
            )
        elif opt.get("meta_info_file") is not None:
            self.paths = paired_paths_from_meta_info_file(
                [self.lq_folder, self.gt_folder], ["lq", "gt"],
                opt["meta_info_file"], self.filename_tmpl,
            )
        else:
            self.paths = paired_paths_from_folder(
                [self.lq_folder, self.gt_folder], ["lq", "gt"], self.filename_tmpl
            )

    def __len__(self):
        return len(self.paths)

    def _load_u8(self, path, key):
        """Decoded uint8 BGR image, via the RAM cache when enabled."""
        if self._cache is not None:
            img = self._cache.get(path)
            if img is None:
                img = imfrombytes(self.file_client.get(path, key))
                with self._cache_lock:
                    self._cache[path] = img
            return img
        return imfrombytes(self.file_client.get(path, key))

    def __getitem__(self, index):
        if self.file_client is None:
            backend = dict(self.io_backend_opt)
            self.file_client = FileClient(backend.pop("type"), **backend)
        scale = self.opt.get("scale", 1)

        gt_path = self.paths[index]["gt_path"]
        lq_path = self.paths[index]["lq_path"]

        # uint8 transfer path (`transfer_dtype: uint8`): crop/augment the
        # decoded uint8 images and ship uint8 RGB to the device — 4x less
        # host->HBM traffic than float32; the train step casts to f32/255
        # on device, where XLA fuses the normalize into the first conv.
        # (TPU-first extension; the reference always ships CHW float,
        # `paired_image_dataset.py:118-120`.)
        if (
            self.opt.get("transfer_dtype") == "uint8"
            and self.opt.get("phase") == "train"
            and scale == 1
            and self.mean is None
            and self.std is None
        ):
            gt_u8 = self._load_u8(gt_path, "gt")
            lq_u8 = self._load_u8(lq_path, "lq")
            gt_size = self.opt["gt_size"]
            if gt_u8.shape[0] < gt_size or gt_u8.shape[1] < gt_size:
                gt_u8, lq_u8 = padding(gt_u8, lq_u8, gt_size)
            gt_u8, lq_u8 = paired_random_crop(gt_u8, lq_u8, gt_size, 1, gt_path)
            if self.opt.get("geometric_augs"):
                gt_u8, lq_u8 = random_augmentation(gt_u8, lq_u8)
            return {"lq": np.ascontiguousarray(lq_u8[..., ::-1]),
                    "gt": np.ascontiguousarray(gt_u8[..., ::-1]),
                    "lq_path": lq_path, "gt_path": gt_path}

        # Native fast path (train, scale 1): fused C++ crop+augment+convert
        # over the decoded uint8 images (native/wavedata.cc).
        if (
            self.opt.get("phase") == "train"
            and scale == 1
            and self.opt.get("use_native", True)
            and self.mean is None
            and self.std is None
        ):
            from wavemamba_tpu.data import native

            if native.available():
                import random as _random

                gt_u8 = self._load_u8(gt_path, "gt")
                lq_u8 = self._load_u8(lq_path, "lq")
                gt_size = self.opt["gt_size"]
                if gt_u8.shape[0] < gt_size or gt_u8.shape[1] < gt_size:
                    gt_u8, lq_u8 = padding(gt_u8, lq_u8, gt_size)
                top = _random.randint(0, gt_u8.shape[0] - gt_size)
                left = _random.randint(0, gt_u8.shape[1] - gt_size)
                mode = _random.randint(1, 7) if self.opt.get("geometric_augs") else 0
                img_gt, img_lq = native.paired_crop_augment(
                    gt_u8, lq_u8, top, left, gt_size, mode
                )
                return {"lq": img_lq, "gt": img_gt, "lq_path": lq_path,
                        "gt_path": gt_path}

        img_gt = self._load_u8(gt_path, "gt").astype(np.float32) / 255.0
        img_lq = self._load_u8(lq_path, "lq").astype(np.float32) / 255.0

        if self.opt.get("phase") == "train":
            gt_size = self.opt["gt_size"]
            img_gt, img_lq = padding(img_gt, img_lq, gt_size)
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size, scale, gt_path)
            if self.opt.get("geometric_augs"):
                img_gt, img_lq = random_augmentation(img_gt, img_lq)

        # BGR -> RGB, HWC float32 (NHWC model layout; no CHW transpose).
        img_gt = np.ascontiguousarray(img_gt[..., ::-1], np.float32)
        img_lq = np.ascontiguousarray(img_lq[..., ::-1], np.float32)
        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean or 0.0, np.float32)
            std = np.asarray(self.std or 1.0, np.float32)
            img_lq = (img_lq - mean) / std
            img_gt = (img_gt - mean) / std
        return {"lq": img_lq, "gt": img_gt, "lq_path": lq_path, "gt_path": gt_path}


class SingleImageDataset:
    """LQ-only dataset for blind testing (`single_image_dataset.py:11-69`)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        self.lq_folder = opt["dataroot_lq"]

        if self.io_backend_opt["type"] == "lmdb":
            from wavemamba_tpu.data.data_util import paths_from_lmdb

            self.io_backend_opt["db_paths"] = [self.lq_folder]
            self.io_backend_opt["client_keys"] = ["lq"]
            self.paths = paths_from_lmdb(self.lq_folder)
        elif opt.get("meta_info_file") is not None:
            import os

            with open(opt["meta_info_file"], "r") as fin:
                self.paths = [
                    os.path.join(self.lq_folder, line.rstrip().split(" ")[0]) for line in fin
                ]
        else:
            from wavemamba_tpu.data.data_util import paths_from_folder

            self.paths = paths_from_folder(self.lq_folder)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        if self.file_client is None:
            backend = dict(self.io_backend_opt)
            self.file_client = FileClient(backend.pop("type"), **backend)
        lq_path = self.paths[index]
        img_lq = imfrombytes(self.file_client.get(lq_path, "lq"), float32=True)
        img_lq = np.ascontiguousarray(img_lq[..., ::-1], np.float32)
        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean or 0.0, np.float32)
            std = np.asarray(self.std or 1.0, np.float32)
            img_lq = (img_lq - mean) / std
        return {"lq": img_lq, "lq_path": lq_path}
