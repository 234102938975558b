"""Device-resident training data: the whole (uint8) dataset is staged into
HBM once, and every batch is sampled + cropped + augmented ON DEVICE.

TPU-first extension with no reference analog (the reference re-decodes and
re-crops on the host every item, `basicsr/data/paired_image_dataset.py:84-120`
+ torch DataLoader workers). Rationale: on hosts where the device link is
slow (e.g. a tunneled TPU at ~10-15 MB/s) or host cores are scarce, the
per-step batch transfer dominates the step time — a batch-8 512^2 uint8
pair is ~6 MB ≈ 0.5 s through the tunnel, against a 0.68 s train step.
Staging the dataset once (e.g. 400 512^2 pairs ≈ 630 MB of HBM) makes the
per-step host work a few random ints, and the gather/crop/dihedral runs in
microseconds on the VPU.

Semantics match the host path (`paired_random_crop` + `random_augmentation`
in data/transforms.py): uniform crop offsets, one dihedral mode in 1..7
shared by the LQ/GT pair. RNG streams differ from the host path (np vs
python `random`) — acceptable for an extension; parity of the TRANSFORMS is
tested leaf-for-leaf in tests/test_device_cache.py.

Single-process only: each process would need the full dataset staged and
cross-process batch assembly is a host-array contract
(`jax.make_array_from_process_local_data`) — callers fall back to the
threaded host loader under multi-process (pipelines/train.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from wavemamba_tpu.parallel.mesh import batch_sharding, replicated
from wavemamba_tpu.utils.file_client import FileClient
from wavemamba_tpu.utils.img_util import imfrombytes


def _dihedral8(img, mode):
    """Device version of transforms.data_augmentation (modes 0..7) for a
    square HWC image: all 8 variants are formed with free/cheap relayouts
    and the per-sample mode selects one (vmap lowers the take to a select;
    8x redundant elementwise work on uint8 is noise at batch scale)."""
    variants = [
        img,                                     # 0
        jnp.flipud(img),                         # 1
        jnp.rot90(img),                          # 2
        jnp.flipud(jnp.rot90(img)),              # 3
        jnp.rot90(img, k=2),                     # 4
        jnp.flipud(jnp.rot90(img, k=2)),         # 5
        jnp.rot90(img, k=3),                     # 6
        jnp.flipud(jnp.rot90(img, k=3)),         # 7
    ]
    return jnp.take(jnp.stack(variants), mode, axis=0)


def _make_sample_fn(gt_size: int, scale: int, geometric_augs: bool):
    lq_size = gt_size // scale

    def crop(im, top, left, size):
        return jax.lax.dynamic_slice(
            im, (top, left, 0), (size, size, im.shape[-1])
        )

    def sample(lq_all, gt_all, idx, tops, lefts, modes):
        lq = jnp.take(lq_all, idx, axis=0)
        gt = jnp.take(gt_all, idx, axis=0)
        lq = jax.vmap(lambda im, t, l: crop(im, t, l, lq_size))(lq, tops, lefts)
        gt = jax.vmap(lambda im, t, l: crop(im, t * scale, l * scale, gt_size))(
            gt, tops, lefts
        )
        if geometric_augs:
            lq = jax.vmap(_dihedral8)(lq, modes)
            gt = jax.vmap(_dihedral8)(gt, modes)
        return lq, gt

    return sample


class DeviceCachedLoader:
    """Drop-in for ThreadedLoader (train phase) yielding DEVICE batches.

    Batches carry jax Arrays for 'lq'/'gt' (uint8, batch dim sharded over
    the mesh 'data' axis) — `device_prefetch` passes non-numpy leaves
    through untouched, and the train step's uint8 normalize-on-device path
    consumes them directly. `yields_device_batches` lets the pipeline skip
    the host staging thread entirely.
    """

    yields_device_batches = True

    def __init__(self, dataset, batch_size, sampler=None, seed=None,
                 mesh=None, budget_gb=8.0):
        opt = dataset.opt
        if opt.get("phase") != "train":
            raise ValueError("DeviceCachedLoader is train-phase only")
        if opt.get("mean") is not None or opt.get("std") is not None:
            raise ValueError("cache_on_device does not support mean/std")
        if jax.process_count() > 1:
            raise ValueError("cache_on_device is single-process only")
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.sampler = sampler
        self.seed = 0 if seed is None else int(seed)
        self.mesh = mesh
        self._epoch = 0
        self.gt_size = int(opt["gt_size"])
        self.scale = int(opt.get("scale", 1))
        self.geometric_augs = bool(opt.get("geometric_augs"))

        backend = dict(dataset.io_backend_opt)
        client = FileClient(backend.pop("type"), **backend)

        lqs, gts = [], []
        for rec in dataset.paths:
            # decoded BGR uint8 -> RGB, matching the host uint8 path
            lq = imfrombytes(client.get(rec["lq_path"], "lq"))[..., ::-1]
            gt = imfrombytes(client.get(rec["gt_path"], "gt"))[..., ::-1]
            lqs.append(np.ascontiguousarray(lq))
            gts.append(np.ascontiguousarray(gt))
        shapes_lq = {a.shape for a in lqs}
        shapes_gt = {a.shape for a in gts}
        if len(shapes_lq) != 1 or len(shapes_gt) != 1:
            raise ValueError(
                f"cache_on_device needs uniform image shapes, got "
                f"lq={sorted(shapes_lq)} gt={sorted(shapes_gt)}"
            )
        lq_all = np.stack(lqs)
        gt_all = np.stack(gts)
        if lq_all.dtype != np.uint8 or gt_all.dtype != np.uint8:
            raise ValueError("cache_on_device expects 8-bit images")
        h, w = lq_all.shape[1:3]
        if h < self.gt_size // self.scale or w < self.gt_size // self.scale:
            raise ValueError(
                f"images ({h},{w}) smaller than crop {self.gt_size}"
                f"//{self.scale} — reflect-pad path is host-only"
            )
        nbytes = lq_all.nbytes + gt_all.nbytes
        if nbytes > budget_gb * (1 << 30):
            raise ValueError(
                f"dataset {nbytes/2**30:.2f} GiB exceeds the device cache "
                f"budget {budget_gb} GiB"
            )
        self.paths = dataset.paths
        self.n = len(self.paths)
        self.crop_max_top = h - self.gt_size // self.scale
        self.crop_max_left = w - self.gt_size // self.scale

        rep = replicated(mesh) if mesh is not None else None
        self.lq_all = jax.device_put(lq_all, rep)
        self.gt_all = jax.device_put(gt_all, rep)
        out_s = batch_sharding(mesh) if mesh is not None else None
        self._sample = jax.jit(
            _make_sample_fn(self.gt_size, self.scale, self.geometric_augs),
            out_shardings=None if out_s is None else (out_s, out_s),
        )

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else self.n
        return n // self.batch_size  # drop_last

    def set_epoch(self, epoch):
        self._epoch = int(epoch)
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)

    def __iter__(self):
        if self.sampler is not None:
            indices = np.asarray(list(iter(self.sampler)), np.int32)
        else:
            indices = np.random.RandomState(self.seed + self._epoch).permutation(
                self.n
            ).astype(np.int32)
        rng = np.random.RandomState((self.seed + self._epoch) ^ 0x5EED)
        nb = len(indices) // self.batch_size
        for b in range(nb):
            idx = indices[b * self.batch_size : (b + 1) * self.batch_size]
            tops = rng.randint(0, self.crop_max_top + 1,
                               size=self.batch_size).astype(np.int32)
            lefts = rng.randint(0, self.crop_max_left + 1,
                                size=self.batch_size).astype(np.int32)
            # random_augmentation picks a mode in 1..7 (transforms.py:127-133)
            modes = (rng.randint(1, 8, size=self.batch_size)
                     if self.geometric_augs
                     else np.zeros(self.batch_size)).astype(np.int32)
            lq, gt = self._sample(self.lq_all, self.gt_all, idx, tops, lefts,
                                  modes)
            yield {
                "lq": lq,
                "gt": gt,
                "lq_path": [self.paths[i]["lq_path"] for i in idx],
                "gt_path": [self.paths[i]["gt_path"] for i in idx],
            }
