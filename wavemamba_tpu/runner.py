"""Model runner — the train/eval logic layer (reference `basicsr/models/`:
`FeMaSRModel` + `BaseModel`), re-designed around pure jitted steps.

Responsibilities (reference citations):
  * build network + losses + optimizer from the YAML opt
    (`femasr_model.py:21-141`)
  * feed data / optimize (L1 + FFT, `femasr_model.py:157-185`) — here a
    single donated jit step (see train/trainer.py)
  * validation with config-declared metrics, best-metric tracking and
    best-checkpoint snapshot (`femasr_model.py:206-318`, `base_model.py:50-83`)
  * checkpoint save/resume (`base_model.py:214-374`) via train/checkpoint.py
  * EMA (`base_model.py:85-92`) inside the jit step
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from wavemamba_tpu.metrics import METRIC_DIRECTION, build_metric
from wavemamba_tpu.models import apply_for, build_network, init_for
from wavemamba_tpu.models.wavemamba import pad_to_multiple
from wavemamba_tpu.train.checkpoint import (
    find_resume_state,
    load_network,
    restore_training_state,
    save_network,
    save_training_state,
)
from wavemamba_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
)
from wavemamba_tpu.utils.img_util import batch2img, imwrite
from wavemamba_tpu.utils.logger import get_root_logger


def train_config_from_opt(opt: dict, loss_mode: str = "l1fft") -> TrainConfig:
    t = opt.get("train", {})
    optim = t.get("optim_g", {})
    sched = dict(t.get("scheduler", {})) or None
    fft_w = 0.0
    if t.get("fft_opt"):
        fft_w = t["fft_opt"].get("loss_weight", 0.1)
    pix_w = (t.get("pixel_opt") or {}).get("loss_weight", 1.0)
    return TrainConfig(
        loss_mode=loss_mode,
        lr=optim.get("lr", 5e-4),
        weight_decay=optim.get("weight_decay", 1e-3),
        betas=tuple(optim.get("betas", (0.9, 0.99))),
        scheduler=sched,
        pixel_weight=pix_w,
        fft_weight=fft_w,
        ema_decay=t.get("ema_decay", 0.0),
        grad_clip=t.get("grad_clip"),
        warmup_iter=t.get("warmup_iter", -1),
    )


class RestorationModel:
    """The `model_type: FeMaSRModel` equivalent."""

    def __init__(self, opt: dict, mesh=None, loss_mode: str = "l1fft"):
        self.opt = opt
        self.mesh = mesh
        self.logger = get_root_logger()
        self.cfg = build_network(opt["network_g"])
        self.is_train = opt.get("is_train", False)
        self.loss_mode = loss_mode

        seed = opt.get("manual_seed", 0) or 0
        self.params = init_for(self.cfg)(jax.random.PRNGKey(seed), self.cfg)

        pretrain = opt.get("path", {}).get("pretrain_network_g")
        if pretrain:
            self.logger.info(f"Loading net_g from {pretrain}")
            self.params = load_network(pretrain, template=self.params)

        self.state = None
        self.train_step = None
        if self.is_train:
            self.tcfg = train_config_from_opt(opt, loss_mode=loss_mode)
            self.state = create_train_state(self.params, self.tcfg)
            self.train_step = make_train_step(self.cfg, self.tcfg, mesh)
            self.params = None  # lives inside state now (donated per step)

        self._eval_fns = {}
        # Static-shape buckets for mixed-size val/test folders (`val:
        # bucket: true`): pad up to a shared 128-multiple bucket so a
        # folder with k size clusters compiles k times, not once per
        # distinct shape. Off by default — bucket padding perturbs
        # borders ~1e-3 (global scan), and training-time validation
        # stays on the reference's exact per-image padding.
        self._bucket_ladder = None
        if opt.get("val", {}).get("bucket"):
            from wavemamba_tpu.models.buckets import BucketLadder

            self._bucket_ladder = BucketLadder()
        self.best_metric_results = {}

    # ------------------------------------------------------------------ train
    def optimize_parameters(self, batch):
        """One jitted step; returns host metrics dict."""
        lq = jnp.asarray(batch["lq"]) if isinstance(batch["lq"], np.ndarray) else batch["lq"]
        gt = jnp.asarray(batch["gt"]) if isinstance(batch["gt"], np.ndarray) else batch["gt"]
        self.state, metrics = self.train_step(self.state, lq, gt)
        return metrics

    def current_params(self, use_ema=True):
        if self.state is None:
            return self.params
        if use_ema and "ema" in self.state:
            return self.state["ema"]
        return self.state["params"]

    def current_lr(self, step=None):
        if not hasattr(self, "_lr_fn"):
            from wavemamba_tpu.train.trainer import make_optimizer

            _, self._lr_fn = make_optimizer(self.tcfg)
        s = int(self.state["step"]) if step is None else step
        return float(self._lr_fn(s)) if callable(self._lr_fn) else float(self._lr_fn)

    # ------------------------------------------------------------------- eval
    def _eval_fn(self, shape):
        if shape not in self._eval_fns:
            apply = apply_for(self.cfg)
            fn = jax.jit(lambda p, x: apply(p, self.cfg, x))
            self._eval_fns[shape] = fn
        return self._eval_fns[shape]

    def test(self, lq_np, pad_multiple=8, tile=None):
        """Whole-image (or tiled, see models/tiling.py) restoration.

        lq_np: (1, H, W, 3) float32 RGB. Returns same-shape np array.
        Dispatch mirrors `femasr_model.py:187-199` (tile only for huge
        inputs — the reference uses an 8000^2 threshold).
        """
        params = self.current_params()
        h, w = lq_np.shape[1:3]
        if tile or (h * w >= 8000 * 8000):
            from wavemamba_tpu.models.tiling import tiled_apply

            # Key the jit cache on the tile config (tiles are fixed-shape
            # per config; keying on None would alias different tile sizes).
            key = ("tile", (tile or {}).get("tile_size", 240),
                   (tile or {}).get("tile_pad", 16))
            return tiled_apply(
                lambda x: self._eval_fn(key)(params, x), lq_np,
                tile_size=(tile or {}).get("tile_size", 240),
                tile_pad=(tile or {}).get("tile_pad", 16),
                pad_multiple=pad_multiple,
            )
        if self._bucket_ladder is not None:
            from wavemamba_tpu.models.buckets import pad_to_shape

            H, W = self._bucket_ladder.shape_for(h, w)
            x, oh, ow = jnp.asarray(pad_to_shape(np.asarray(lq_np), H, W)), h, w
        else:
            x, oh, ow = pad_to_multiple(jnp.asarray(lq_np), pad_multiple)
        out = self._eval_fn(tuple(x.shape))(params, x)
        if isinstance(out, (tuple, list)):  # two-output nets (UHDModel): keep
            out = out[0]  # the full-res output (`uhdfour_model.py:200`)
        return np.asarray(out)[:, :oh, :ow]

    def validation(self, dataloader, current_iter, save_img=False,
                   num_shards=None, shard_id=None):
        """Distributed validation loop.

        The reference punts on this ("Only support single GPU validation",
        `femasr_model.py:201-204`); here the val set is sharded
        round-robin across processes (default: `jax.process_index()` of
        `jax.process_count()`) and per-metric sums/counts are aggregated
        with a host all-gather, so every process returns the same global
        averages. Image writes happen on the process that evaluated the
        image (shards are disjoint)."""
        opt_val = self.opt.get("val", {})
        metric_opts = opt_val.get("metrics") or {}
        if num_shards is None:
            num_shards = jax.process_count()
        if shard_id is None:
            shard_id = jax.process_index()
        metrics = {}
        key_metric_name = opt_val.get("key_metric")
        for name, mopt in metric_opts.items():
            mopt = dict(mopt)
            try:
                metrics[name] = build_metric(mopt)
            except (ValueError, KeyError) as e:
                if name == key_metric_name:
                    # Best-model tracking hinges on this metric
                    # (`femasr_model.py:270-297`); degrading it to a warning
                    # would silently disable best-ckpt selection.
                    raise ValueError(
                        f"key metric {name!r} failed to build: {e}"
                    ) from e
                self.logger.warning(f"metric {name} skipped: {e}")
        results = {name: [] for name in metrics}
        t0 = time.time()
        for i, batch in enumerate(dataloader):
            if i % num_shards != shard_id:
                continue
            lq = batch["lq"]
            gt = batch.get("gt")
            out = self.test(lq)
            sr_img = batch2img(out)
            if save_img:
                img_name = os.path.splitext(os.path.basename(batch["lq_path"][0]))[0]
                save_path = os.path.join(
                    self.opt["path"]["visualization"], f"{img_name}_{current_iter}.png"
                )
                imwrite(sr_img, save_path)
            if gt is not None:
                gt_img = batch2img(gt)
                for name, fn in metrics.items():
                    results[name].append(fn(sr_img, gt_img))
        avg = self._aggregate_val_results(results, num_shards)
        self.logger.info(
            f"Validation @ iter {current_iter} ({time.time()-t0:.1f}s): "
            + ", ".join(f"{k}: {v:.4f}" for k, v in avg.items())
        )
        # best-metric tracking (key_metric, `femasr_model.py:270-297`)
        key_metric = opt_val.get("key_metric")
        improved = False
        if key_metric and key_metric in avg:
            higher_better = METRIC_DIRECTION.get(key_metric, True)
            best = self.best_metric_results.get(key_metric)
            if best is None or (avg[key_metric] > best if higher_better else avg[key_metric] < best):
                self.best_metric_results[key_metric] = avg[key_metric]
                improved = True
        return avg, improved

    @staticmethod
    def _aggregate_val_results(results: dict, num_shards: int) -> dict:
        """Local per-metric value lists -> global averages. With one shard
        this is a plain mean; with several, per-process (sum, count) pairs
        are all-gathered across hosts and combined."""
        if num_shards <= 1 or jax.process_count() == 1:
            return {name: float(np.mean(v)) for name, v in results.items() if v}
        from jax.experimental import multihost_utils

        names = sorted(results)
        local = np.array(
            [[float(np.sum(results[n])), float(len(results[n]))] for n in names],
            np.float64,
        )
        gathered = np.asarray(multihost_utils.process_allgather(local))
        totals = gathered.sum(axis=0)  # (n_metrics, 2)
        return {
            n: float(totals[i, 0] / totals[i, 1])
            for i, n in enumerate(names)
            if totals[i, 1] > 0
        }

    # ------------------------------------------------------------ checkpoints
    def save(self, current_iter):
        models_dir = self.opt["path"]["models"]
        save_network(self.current_params(use_ema=False), models_dir, "net_g", current_iter)
        if self.state is not None and "ema" in self.state:
            save_network(self.state["ema"], models_dir, "net_g_ema", current_iter)
        if self.state is not None:
            save_training_state(
                self.state, self.opt["path"]["training_states"], current_iter
            )

    def save_best(self):
        save_network(
            self.current_params(use_ema=False), self.opt["path"]["models"], "net_g_best", -1
        )

    def resume(self):
        """Auto-resume from the highest training state (`train.py:99-120`)."""
        states_dir = self.opt["path"]["training_states"]
        path = find_resume_state(states_dir)
        if path is None:
            return 0
        self.logger.info(f"Resuming from {path}")
        self.state = restore_training_state(path, self.state)
        return int(self.state["step"])


def build_model(opt: dict, mesh=None):
    """`model_type` dispatch (`basicsr/models/__init__.py:19`).

    UHDModel gets the UHDFour training semantics (L1 + 0.0004*(1-SSIM) +
    0.1*L1@1/8 [+FFT], `uhdfour_model.py:157-186`) and requires a network
    whose apply returns (out, out8) — single-output nets raise at the first
    train step, matching the reference's unpack failure at
    `uhdfour_model.py:164`."""
    mtype = opt.get("model_type", "FeMaSRModel")
    if mtype in ("FeMaSRModel", "RestorationModel"):
        return RestorationModel(opt, mesh=mesh)
    if mtype == "UHDModel":
        return RestorationModel(opt, mesh=mesh, loss_mode="uhd")
    raise KeyError(f"Unknown model_type {mtype!r}")
