"""Training pipeline (`basicsr/train.py:123-267`), TPU-native.

Differences from the reference runner:
  * one process drives all local devices (data-parallel mesh); multi-host
    runs shard the sampler by `jax.process_index()` like the reference's
    rank (`EnlargedSampler`, `data_sampler.py:6-48`)
  * global batch = batch_size_per_gpu * n_devices (the reference's per-GPU
    batch semantics)
  * loss tensors stay on device; host sync happens only at print_freq
  * checkpoints are Orbax dirs (see train/checkpoint.py), auto-resume scans
    training_states/ for the highest step
"""

from __future__ import annotations

import os
import time

from wavemamba_tpu.data import EnlargedSampler, ThreadedLoader, build_dataset, device_prefetch
from wavemamba_tpu.parallel.mesh import batch_sharding, make_mesh
from wavemamba_tpu.runner import build_model
from wavemamba_tpu.train.checkpoint import find_resume_state
from wavemamba_tpu.utils.logger import (
    AvgTimer,
    MessageLogger,
    get_env_info,
    get_root_logger,
    init_tb_logger,
)
from wavemamba_tpu.utils.misc import make_exp_dirs, set_random_seed
from wavemamba_tpu.utils.options import copy_opt_file, dict2str, parse_options


def create_train_val_dataloader(opt, mesh, logger):
    import jax

    train_loader, val_loader = None, None
    total_iters = int(opt["train"]["total_iter"])
    n_dev = mesh.devices.size
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            train_set = build_dataset(dataset_opt)
            ratio = dataset_opt.get("dataset_enlarge_ratio", 1)
            sampler = EnlargedSampler(
                len(train_set), jax.process_count(), jax.process_index(), ratio
            )
            # Each process decodes only its local shard of the global batch
            # (batch_size_per_gpu * local devices); device_prefetch assembles
            # the global array across processes. global_batch is the optics
            # number (iters/epoch, logging).
            global_batch = dataset_opt.get("batch_size_per_gpu", 1) * n_dev
            local_batch = dataset_opt.get("batch_size_per_gpu", 1) * jax.local_device_count()
            train_loader = None
            if dataset_opt.get("cache_on_device"):
                # Device-resident dataset: batches are sampled/cropped/
                # augmented in HBM (see data/device_cache.py). Falls back to
                # the threaded host loader when the dataset doesn't qualify
                # (multi-process, non-uniform shapes, over HBM budget, ...).
                from wavemamba_tpu.data.device_cache import DeviceCachedLoader

                try:
                    train_loader = DeviceCachedLoader(
                        train_set,
                        batch_size=global_batch,
                        sampler=sampler,
                        seed=opt.get("manual_seed"),
                        mesh=mesh,
                        budget_gb=dataset_opt.get("device_cache_budget_gb", 8.0),
                    )
                    logger.info(
                        "cache_on_device: dataset staged in HBM "
                        f"({(train_loader.lq_all.nbytes + train_loader.gt_all.nbytes)/2**20:.0f} MiB); "
                        "per-step host work is index RNG only"
                    )
                except ValueError as e:
                    logger.warning(
                        f"cache_on_device unavailable ({e}); using host loader"
                    )
            if train_loader is None:
                train_loader = ThreadedLoader(
                    train_set,
                    batch_size=local_batch,
                    sampler=sampler,
                    num_workers=dataset_opt.get("num_worker_per_gpu", 4),
                    drop_last=True,
                    seed=opt.get("manual_seed"),
                )
            iters_per_epoch = len(train_loader)
            if iters_per_epoch == 0:
                raise ValueError(
                    f"Train loader is empty: dataset of {len(train_set)} images "
                    f"with global batch {global_batch} (drop_last) yields no "
                    f"batches — raise dataset_enlarge_ratio or lower the batch."
                )
            total_epochs = -(-total_iters // max(iters_per_epoch, 1))
            logger.info(
                f"Training statistics: images {len(train_set)}, global batch "
                f"{global_batch} ({n_dev} devices), iters/epoch {iters_per_epoch}, "
                f"total epochs {total_epochs}, total iters {total_iters}"
            )
        elif phase.startswith("val"):
            val_set = build_dataset(dataset_opt)
            val_loader = ThreadedLoader(val_set, batch_size=1, num_workers=2)
            logger.info(f"Validation images: {len(val_set)}")
    return train_loader, val_loader, total_iters


def train_pipeline(root_path, args=None):
    opt, parsed = parse_options(root_path, is_train=True, args=args)
    set_random_seed(opt["manual_seed"])

    # Archive an existing experiment dir only when starting fresh; with
    # --auto_resume and a saved training state, resume IN PLACE (reference
    # `basicsr/train.py:99-136`: make_exp_dirs runs only if resume_state is
    # None — archiving first would hide the states auto-resume looks for).
    resuming = bool(
        opt.get("auto_resume")
        and find_resume_state(opt["path"]["training_states"]) is not None
    )
    make_exp_dirs(opt, archive=not resuming)
    copy_opt_file(parsed.opt, opt["path"]["experiments_root"])
    log_file = os.path.join(
        opt["path"]["log"], f"train_{opt['name']}_{int(time.time())}.log"
    )
    logger = get_root_logger(log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))
    tb_logger = None
    if opt.get("logger", {}).get("use_tb_logger") and "debug" not in opt["name"]:
        try:
            tb_logger = init_tb_logger(os.path.join(opt["path"]["log"], "tb_logger"))
        except Exception as e:
            logger.warning(f"tensorboard unavailable: {e}")

    mesh = make_mesh()
    train_loader, val_loader, total_iters = create_train_val_dataloader(opt, mesh, logger)
    model = build_model(opt, mesh)

    start_iter = 0
    if opt.get("auto_resume"):
        start_iter = model.resume()

    msg_logger = MessageLogger(opt, start_iter + 1, tb_logger)
    iter_timer, data_timer = AvgTimer(), AvgTimer()
    print_freq = opt["logger"]["print_freq"]
    save_freq = opt["logger"]["save_checkpoint_freq"]
    val_freq = opt.get("val", {}).get("val_freq")

    current_iter = start_iter
    # On resume, restart at the epoch the saved iter falls in (the reference
    # stores epoch in the training state, `base_model.py:326-359`; deriving
    # it keeps the state a pure pytree).
    epoch = start_iter // max(len(train_loader), 1)
    sharding = batch_sharding(mesh)
    logger.info(f"Start training from iter {current_iter}")
    start = time.time()
    # Device-cached loaders already yield sharded device batches; wrapping
    # them in the host staging thread would be a no-op queue hop.
    if getattr(train_loader, "yields_device_batches", False):
        prefetch = iter
    else:
        prefetch = lambda ldr: device_prefetch(ldr, sharding)  # noqa: E731
    while current_iter < total_iters:
        train_loader.set_epoch(epoch)
        for batch in prefetch(train_loader):
            data_timer.record()
            if current_iter >= total_iters:
                break
            current_iter += 1
            metrics = model.optimize_parameters(batch)
            iter_timer.record()

            if current_iter % print_freq == 0:
                log_vars = {"epoch": epoch, "iter": current_iter,
                            "lrs": [model.current_lr(current_iter)],
                            "time": iter_timer.get_avg_time(),
                            "data_time": data_timer.get_avg_time()}
                log_vars.update({k: float(v) for k, v in metrics.items()})
                msg_logger(log_vars)
            if current_iter % save_freq == 0:
                logger.info("Saving models and training states.")
                model.save(current_iter)
            if val_freq and val_loader is not None and current_iter % val_freq == 0:
                # NOTE: no sharding on the val prefetch — deliberate. Each
                # process evaluates its round-robin shard of the val set on
                # its own device 0 (batch-1 host arrays), and the global
                # averages come from validation()'s process_allgather; a
                # mesh sharding here would wrongly scatter batch-1 arrays.
                _, improved = model.validation(
                    device_prefetch(val_loader),
                    current_iter,
                    save_img=opt["val"].get("save_img", False),
                )
                if improved:
                    model.save_best()
            data_timer.start()
            iter_timer.start()
        epoch += 1

    consumed = str(int(time.time() - start))
    logger.info(f"End of training. Time consumed: {consumed}s")
    model.save(-1)  # latest
    if val_loader is not None and val_freq:
        model.validation(device_prefetch(val_loader), current_iter,
                         save_img=opt.get("val", {}).get("save_img", False))
    return model
