"""Test pipeline (`basicsr/test.py:11-46` — with the reference's
build_dataset/create_dataset NameError fixed by construction)."""

from __future__ import annotations

import os
import time

from wavemamba_tpu.data import ThreadedLoader, build_dataset, device_prefetch
from wavemamba_tpu.parallel.mesh import make_mesh
from wavemamba_tpu.runner import build_model
from wavemamba_tpu.utils.logger import get_env_info, get_root_logger
from wavemamba_tpu.utils.misc import make_exp_dirs
from wavemamba_tpu.utils.options import dict2str, parse_options


def test_pipeline(root_path, args=None):
    opt, parsed = parse_options(root_path, is_train=False, args=args)
    make_exp_dirs(opt)
    log_file = os.path.join(opt["path"]["log"], f"test_{opt['name']}_{int(time.time())}.log")
    logger = get_root_logger(log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))

    mesh = make_mesh()
    loaders = []
    for _, dataset_opt in sorted(opt["datasets"].items()):
        test_set = build_dataset(dataset_opt)
        loaders.append(
            (dataset_opt["name"], ThreadedLoader(test_set, batch_size=1, num_workers=2))
        )
        logger.info(f"Number of test images in {dataset_opt['name']}: {len(test_set)}")

    model = build_model(opt, mesh)
    results = {}
    for name, loader in loaders:
        logger.info(f"Testing {name}...")
        avg, _ = model.validation(
            device_prefetch(loader), current_iter=opt["name"],
            save_img=opt.get("val", {}).get("save_img", True),
        )
        results[name] = avg
    return results
