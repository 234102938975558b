"""End-to-end framework slice: synthetic dataset -> train_pipeline (debug
iters) -> checkpoint -> inference CLI -> metrics. All on CPU, tiny model."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier: pytest -m ""
import yaml

import cv2


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rs = np.random.RandomState(0)
    for split in ["train", "val"]:
        gt_dir = root / split / "gt"
        lq_dir = root / split / "input"
        gt_dir.mkdir(parents=True)
        lq_dir.mkdir(parents=True)
        n = 6 if split == "train" else 2
        for i in range(n):
            gt = (rs.rand(40, 48, 3) * 255).astype(np.uint8)
            lq = (gt * 0.3).astype(np.uint8)  # "low light"
            cv2.imwrite(str(gt_dir / f"{i:03d}.png"), gt)
            cv2.imwrite(str(lq_dir / f"{i:03d}.png"), lq)
    return root


def _write_opt(tmp_path, data_root):
    opt = {
        "name": "tiny_e2e",
        "model_type": "FeMaSRModel",
        "scale": 1,
        "manual_seed": 0,
        "datasets": {
            "train": {
                "name": "t",
                "type": "PairedImageDataset",
                "dataroot_gt": str(data_root / "train" / "gt"),
                "dataroot_lq": str(data_root / "train" / "input"),
                "io_backend": {"type": "disk"},
                "gt_size": 32,
                "geometric_augs": True,
                "batch_size_per_gpu": 2,  # global = 2 * 8 virtual devices
                "num_worker_per_gpu": 2,
                "dataset_enlarge_ratio": 8,
            },
            "val": {
                "name": "v",
                "type": "PairedImageDataset",
                "dataroot_gt": str(data_root / "val" / "gt"),
                "dataroot_lq": str(data_root / "val" / "input"),
                "io_backend": {"type": "disk"},
            },
        },
        "network_g": {
            "type": "WaveMamba",
            "in_chn": 3,
            "wf": 8,
            "n_l_blocks": [1, 1, 1],
            "n_h_blocks": [1, 1, 1],
            "ffn_scale": 2.0,
            "scan_chunk": 16,
        },
        "path": {"pretrain_network_g": None, "resume_state": None},
        "train": {
            "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-3,
                        "betas": [0.9, 0.99]},
            "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                          "periods": [10, 100], "restart_weights": [1, 1],
                          "eta_mins": [1e-3, 1e-7]},
            "total_iter": 6,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "fft_opt": {"type": "FFTLoss", "loss_weight": 0.1},
        },
        "val": {
            "val_freq": 3,
            "save_img": True,
            "key_metric": "psnr",
            "metrics": {
                "psnr": {"type": "psnr", "crop_border": 0, "test_y_channel": False},
                "ssim": {"type": "ssim", "crop_border": 0, "test_y_channel": False},
            },
        },
        "logger": {"print_freq": 2, "save_checkpoint_freq": 3, "use_tb_logger": False},
    }
    p = tmp_path / "opt.yml"
    p.write_text(yaml.safe_dump(opt))
    return p


def test_train_pipeline_and_inference(synth_data, tmp_path):
    from wavemamba_tpu.pipelines.train import train_pipeline

    opt_path = _write_opt(tmp_path, synth_data)
    model = train_pipeline(str(tmp_path), args=["-opt", str(opt_path)])

    exp = tmp_path / "experiments" / "tiny_e2e"
    models_dir = exp / "models"
    assert (models_dir / "net_g_latest").is_dir()
    assert (models_dir / "net_g_3").is_dir()
    assert (exp / "training_states" / "3").is_dir()
    # validation ran and produced images + metrics
    assert any((exp / "visualization").iterdir())
    assert "psnr" in model.best_metric_results

    # auto-resume finds the saved state
    from wavemamba_tpu.train.checkpoint import find_resume_state

    resume = find_resume_state(str(exp / "training_states"))
    assert resume is not None and resume.endswith(("3", "6"))

    # Re-run with --auto_resume: must resume IN PLACE (no archived copy of
    # the experiment dir — the reference archives only when starting fresh,
    # `basicsr/train.py:130-136`) and continue past the saved iter.
    import yaml as _yaml

    opt2 = _yaml.safe_load(opt_path.read_text())
    opt2["train"]["total_iter"] = 9
    opt2_path = tmp_path / "opt_resume.yml"
    opt2_path.write_text(_yaml.safe_dump(opt2))
    model2 = train_pipeline(str(tmp_path), args=["-opt", str(opt2_path),
                                                 "--auto_resume"])
    archived = [d for d in (tmp_path / "experiments").iterdir()
                if "archived" in d.name]
    assert not archived, f"resume archived the experiment dir: {archived}"
    assert int(model2.state["step"]) == 9  # 6 resumed + 3 new
    assert (exp / "training_states" / "9").is_dir()

    # test_pipeline (offline eval runner, `basicsr/test.py:11-46`) against
    # the trained checkpoint: metrics computed, result images written.
    test_opt = {
        "name": "tiny_e2e_test",
        "model_type": "FeMaSRModel",
        "scale": 1,
        "manual_seed": 0,
        "datasets": {
            "test_1": {
                "name": "synthval",
                "type": "PairedImageDataset",
                "dataroot_gt": str(synth_data / "val" / "gt"),
                "dataroot_lq": str(synth_data / "val" / "input"),
                "io_backend": {"type": "disk"},
            },
        },
        "network_g": {
            "type": "WaveMamba", "in_chn": 3, "wf": 8,
            "n_l_blocks": [1, 1, 1], "n_h_blocks": [1, 1, 1],
            "ffn_scale": 2.0, "scan_chunk": 16,
        },
        "path": {"pretrain_network_g": str(models_dir / "net_g_latest")},
        "val": {
            "save_img": True,
            "metrics": {
                "psnr": {"type": "psnr", "crop_border": 0,
                         "test_y_channel": False},
            },
        },
    }
    test_opt_path = tmp_path / "opt_test.yml"
    test_opt_path.write_text(yaml.safe_dump(test_opt))
    from wavemamba_tpu.pipelines.test import test_pipeline

    results = test_pipeline(str(tmp_path), args=["-opt", str(test_opt_path)])
    assert "synthval" in results and "psnr" in results["synthval"]
    assert np.isfinite(results["synthval"]["psnr"])
    vis = tmp_path / "results" / "tiny_e2e_test" / "visualization"
    assert any(vis.rglob("*.png"))

    # inference CLI against the trained checkpoint
    from inference import main as infer_main

    out_dir = tmp_path / "infer_out"
    infer_main([
        "-i", str(synth_data / "val" / "input"),
        "-g", str(synth_data / "val" / "gt"),
        "-w", str(models_dir / "net_g_latest"),
        "-o", str(out_dir),
        "--wf", "8",
        "--n_l_blocks", "1", "1", "1",
        "--n_h_blocks", "1", "1", "1",
    ])
    outs = list(out_dir.iterdir())
    assert len(outs) == 2
    img = cv2.imread(str(outs[0]))
    assert img.shape == (40, 48, 3)
