"""Every shipped options/*.yml must stay constructible: the yaml parses,
`network_g` builds a model config, and the train section builds a
TrainConfig + closed-form scheduler. Guards config drift — the reference
only discovers a broken yml at launch time (`basicsr/utils/options.py`
parses lazily); here the whole shipped config inventory is CI-checked.
"""

import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
YMLS = sorted(glob.glob(os.path.join(REPO, "options", "*.yml")))


@pytest.mark.parametrize("path", YMLS, ids=[os.path.basename(p) for p in YMLS])
def test_option_yml_builds(path):
    from wavemamba_tpu.models import build_network
    from wavemamba_tpu.runner import train_config_from_opt
    from wavemamba_tpu.train.schedules import build_scheduler
    from wavemamba_tpu.utils.options import yaml_load

    opt = yaml_load(path)
    assert opt.get("model_type") in ("FeMaSRModel", "UHDModel"), path

    cfg = build_network(opt["network_g"])
    assert cfg.wf > 0 and len(cfg.n_l_blocks) == 3

    tcfg = train_config_from_opt(opt)
    assert tcfg.lr > 0
    total = int(opt["train"]["total_iter"])
    sched = build_scheduler(opt["train"]["scheduler"], tcfg.lr)
    # The closed-form schedule must be finite and positive over the run,
    # and periods must cover total_iter for cyclic schedulers.
    for it in (0, 1, total // 2, total - 1):
        lr = float(sched(it))
        assert 0.0 < lr <= tcfg.lr * 1.0001, (path, it, lr)

    # Train dataset contract used by the pipelines.
    train_ds = opt["datasets"]["train"]
    assert train_ds["type"] in ("PairedImageDataset",)
    assert int(train_ds["batch_size_per_gpu"]) > 0
    assert int(train_ds["gt_size"]) % 8 == 0  # model pad multiple
