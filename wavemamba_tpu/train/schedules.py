"""Learning-rate schedules — optax-style `step -> lr` functions with the
semantics of `basicsr/models/lr_scheduler.py`.

  * multistep_restart           lr_scheduler.py:6-33
  * cosine_annealing_restart_cyclic  lr_scheduler.py:57-106 (per-period
    eta_min — the schedule the shipped configs use:
    `options/train_wavemamba_uhdll.yml:86-90`)
  * cosine_annealing_restart    lr_scheduler.py:108-147

All are jit-traceable (piecewise math on the step array, no python branches
on traced values).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _period_index(cumulative, step):
    """Index of the period containing `step`. The reference's
    `get_position_from_periods` (lr_scheduler.py:36-54) tests
    `iteration <= cumulative_period[i]`, so a step landing exactly on a
    restart boundary still belongs to the OLD period (lr = eta_min there,
    not the restarted peak) — hence strict `>` here."""
    cum = jnp.asarray(cumulative)
    return jnp.clip(jnp.sum(step > cum), 0, len(cumulative) - 1)


def cosine_annealing_restart_cyclic(base_lr, periods, restart_weights=None, eta_mins=None):
    """Cosine annealing with restarts; each cycle has its own eta_min."""
    restart_weights = restart_weights or [1.0] * len(periods)
    eta_mins = eta_mins or [0.0] * len(periods)
    assert len(periods) == len(restart_weights) == len(eta_mins)
    cumulative = np.cumsum(periods).tolist()
    starts = jnp.asarray([0] + cumulative[:-1], jnp.float32)
    periods_a = jnp.asarray(periods, jnp.float32)
    weights_a = jnp.asarray(restart_weights, jnp.float32)
    etas_a = jnp.asarray(eta_mins, jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        idx = _period_index(cumulative, step)
        w = weights_a[idx]
        eta = etas_a[idx]
        frac = (step - starts[idx]) / periods_a[idx]
        return eta + w * 0.5 * (base_lr - eta) * (1.0 + jnp.cos(jnp.pi * frac))

    return schedule


def cosine_annealing_restart(base_lr, periods, restart_weights=None, eta_min=0.0):
    n = len(periods)
    return cosine_annealing_restart_cyclic(
        base_lr, periods, restart_weights or [1.0] * n, [eta_min] * n
    )


def multistep_restart(base_lr, milestones, gamma=0.1, restarts=(0,), restart_weights=(1,)):
    """Step decay at milestones; lr resets to base*weight at restart iters."""
    assert len(restarts) == len(restart_weights)
    milestones = sorted(milestones)
    restarts_a = sorted(zip(restarts, restart_weights))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # weight of the most recent restart at/before `step`
        w = jnp.asarray(1.0, jnp.float32)
        for r, rw in restarts_a:
            w = jnp.where(step >= r, jnp.float32(rw), w)
        last_restart = jnp.asarray(0.0, jnp.float32)
        for r, _ in restarts_a:
            last_restart = jnp.where(step >= r, jnp.float32(r), last_restart)
        # count milestones passed since last restart
        decays = jnp.asarray(0, jnp.int32)
        for m in milestones:
            decays = decays + ((step >= m) & (m > last_restart)).astype(jnp.int32)
        return base_lr * w * gamma**decays

    return schedule


def build_scheduler(opt: dict, base_lr: float):
    """YAML scheduler opt -> schedule fn (mirrors `base_model.py:126-140`)."""
    opt = dict(opt)
    name = opt.pop("type")
    if name == "CosineAnnealingRestartCyclicLR":
        return cosine_annealing_restart_cyclic(
            base_lr, opt["periods"], opt.get("restart_weights"), opt.get("eta_mins")
        )
    if name == "CosineAnnealingRestartLR":
        return cosine_annealing_restart(
            base_lr, opt["periods"], opt.get("restart_weights"), opt.get("eta_min", 0.0)
        )
    if name == "MultiStepLR" or name == "MultiStepRestartLR":
        return multistep_restart(
            base_lr,
            opt.get("milestones", []),
            opt.get("gamma", 0.1),
            tuple(opt.get("restarts", (0,))),
            tuple(opt.get("restart_weights", (1,))),
        )
    raise KeyError(f"Unknown scheduler type {name!r}")
