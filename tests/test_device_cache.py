"""Device-resident dataset cache (data/device_cache.py): transform parity
vs the host path, mesh sharding, and loader/pipeline integration."""

import numpy as np
import pytest

import jax

from wavemamba_tpu.data.device_cache import DeviceCachedLoader
from wavemamba_tpu.data.paired_image_dataset import PairedImageDataset
from wavemamba_tpu.data.transforms import data_augmentation
from wavemamba_tpu.parallel.mesh import make_mesh

cv2 = pytest.importorskip("cv2")


def _write_dataset(root, n=8, size=24, lq_size=None):
    rng = np.random.RandomState(3)
    (root / "gt").mkdir(parents=True)
    (root / "input").mkdir(parents=True)
    for i in range(n):
        gt = rng.randint(0, 256, (size, size, 3), np.uint8)
        lq = (
            rng.randint(0, 256, (lq_size, lq_size, 3), np.uint8)
            if lq_size
            else (gt // 2).astype(np.uint8)
        )
        cv2.imwrite(str(root / "gt" / f"{i:03d}.png"), gt)
        cv2.imwrite(str(root / "input" / f"{i:03d}.png"), lq)


def _dataset(root, **extra):
    opt = {
        "phase": "train",
        "dataroot_gt": str(root / "gt"),
        "dataroot_lq": str(root / "input"),
        "io_backend": {"type": "disk"},
        "gt_size": 16,
        "scale": 1,
        "geometric_augs": True,
    }
    opt.update(extra)
    return PairedImageDataset(opt)


def test_device_transforms_match_host(tmp_path):
    _write_dataset(tmp_path, n=6, size=24)
    loader = DeviceCachedLoader(_dataset(tmp_path), batch_size=4, seed=0)
    lq_all = np.asarray(loader.lq_all)
    gt_all = np.asarray(loader.gt_all)

    idx = np.asarray([5, 0, 3, 3], np.int32)
    tops = np.asarray([0, 8, 3, 7], np.int32)
    lefts = np.asarray([8, 0, 5, 1], np.int32)
    modes = np.asarray([0, 1, 4, 7], np.int32)
    lq, gt = loader._sample(loader.lq_all, loader.gt_all, idx, tops, lefts, modes)
    lq, gt = np.asarray(lq), np.asarray(gt)
    assert lq.dtype == np.uint8 and gt.dtype == np.uint8
    for b in range(4):
        for dev, host_all in ((lq[b], lq_all), (gt[b], gt_all)):
            crop = host_all[idx[b], tops[b] : tops[b] + 16, lefts[b] : lefts[b] + 16]
            np.testing.assert_array_equal(dev, data_augmentation(crop, int(modes[b])))


def test_scale2_crop_alignment(tmp_path):
    _write_dataset(tmp_path, n=4, size=24, lq_size=12)
    loader = DeviceCachedLoader(
        _dataset(tmp_path, gt_size=8, scale=2), batch_size=2, seed=0
    )
    idx = np.asarray([1, 2], np.int32)
    tops = np.asarray([3, 0], np.int32)
    lefts = np.asarray([0, 5], np.int32)
    modes = np.asarray([2, 6], np.int32)
    lq, gt = loader._sample(loader.lq_all, loader.gt_all, idx, tops, lefts, modes)
    assert np.asarray(lq).shape == (2, 4, 4, 3)
    assert np.asarray(gt).shape == (2, 8, 8, 3)
    gt_all = np.asarray(loader.gt_all)
    for b in range(2):
        crop = gt_all[idx[b], 2 * tops[b] : 2 * tops[b] + 8, 2 * lefts[b] : 2 * lefts[b] + 8]
        np.testing.assert_array_equal(
            np.asarray(gt)[b], data_augmentation(crop, int(modes[b]))
        )


def test_loader_iteration_sharded(tmp_path):
    _write_dataset(tmp_path, n=16, size=24)
    mesh = make_mesh()
    loader = DeviceCachedLoader(_dataset(tmp_path), batch_size=8, seed=1, mesh=mesh)
    assert len(loader) == 2
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert isinstance(b["lq"], jax.Array) and b["lq"].shape == (8, 16, 16, 3)
    assert len(b["lq_path"]) == 8
    # batch dim sharded over the 'data' axis
    shard_shapes = {s.data.shape for s in b["lq"].addressable_shards}
    assert shard_shapes == {(1, 16, 16, 3)}
    # epochs reshuffle
    loader.set_epoch(1)
    batches2 = list(loader)
    assert not np.array_equal(np.asarray(batches[0]["lq"]), np.asarray(batches2[0]["lq"]))


@pytest.mark.slow  # compile-heavy; contract also covered in fast tier/dryrun
def test_train_pipeline_with_device_cache(tmp_path):
    """cache_on_device engages inside train_pipeline (no host-loader
    fallback) and trains/checkpoints normally."""
    import yaml

    from wavemamba_tpu.pipelines.train import train_pipeline

    root = tmp_path / "data"
    _write_dataset(root, n=8, size=40)
    opt = {
        "name": "tiny_devcache",
        "model_type": "FeMaSRModel",
        "scale": 1,
        "manual_seed": 0,
        "datasets": {
            "train": {
                "name": "t",
                "type": "PairedImageDataset",
                "dataroot_gt": str(root / "gt"),
                "dataroot_lq": str(root / "input"),
                "io_backend": {"type": "disk"},
                "gt_size": 32,
                "geometric_augs": True,
                "batch_size_per_gpu": 1,  # global = 8 virtual devices
                "dataset_enlarge_ratio": 8,
                "cache_on_device": True,
            },
        },
        "network_g": {
            "type": "WaveMamba", "in_chn": 3, "wf": 8,
            "n_l_blocks": [1, 1, 1], "n_h_blocks": [1, 1, 1],
            "ffn_scale": 2.0, "scan_chunk": 16,
        },
        "path": {"pretrain_network_g": None, "resume_state": None},
        "train": {
            "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-3,
                        "betas": [0.9, 0.99]},
            "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                          "periods": [10, 100], "restart_weights": [1, 1],
                          "eta_mins": [1e-3, 1e-7]},
            "total_iter": 4,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
        },
        "logger": {"print_freq": 2, "save_checkpoint_freq": 4,
                   "use_tb_logger": False},
    }
    opt_path = tmp_path / "opt.yml"
    opt_path.write_text(yaml.safe_dump(opt))
    model = train_pipeline(str(tmp_path), args=["-opt", str(opt_path)])
    assert int(model.state["step"]) == 4
    exp = tmp_path / "experiments" / "tiny_devcache"
    assert (exp / "models" / "net_g_latest").is_dir()
    logs = list(exp.glob("train_*.log"))
    assert logs and "cache_on_device: dataset staged" in logs[0].read_text()


def test_guards(tmp_path):
    _write_dataset(tmp_path, n=4, size=24)
    with pytest.raises(ValueError, match="budget"):
        DeviceCachedLoader(_dataset(tmp_path), batch_size=2, budget_gb=1e-6)
    # non-uniform shapes
    cv2.imwrite(
        str(tmp_path / "gt" / "003.png"),
        np.zeros((30, 30, 3), np.uint8),
    )
    with pytest.raises(ValueError, match="uniform"):
        DeviceCachedLoader(_dataset(tmp_path), batch_size=2)
