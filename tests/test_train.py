import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavemamba_tpu.models.wavemamba import WaveMambaConfig, init_wavemamba
from wavemamba_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from wavemamba_tpu.train.schedules import (
    cosine_annealing_restart_cyclic,
    multistep_restart,
)
from wavemamba_tpu.train.trainer import TrainConfig, create_train_state, make_train_step

TINY = WaveMambaConfig(wf=8, n_l_blocks=(1, 1, 1), n_h_blocks=(1, 1, 1), scan_chunk=16)


def test_cosine_cyclic_matches_reference_formula():
    """Check against the closed-form of lr_scheduler.py:57-106."""
    base_lr = 5e-4
    periods = [100, 100000]
    eta_mins = [5e-4, 1e-7]
    weights = [1.0, 1.0]
    sched = cosine_annealing_restart_cyclic(base_lr, periods, weights, eta_mins)

    def ref(step):
        cum = [100, 100100]
        idx = 0 if step < 100 else 1
        nearest = 0 if idx == 0 else cum[idx - 1]
        eta = eta_mins[idx]
        return eta + weights[idx] * 0.5 * (base_lr - eta) * (
            1 + math.cos(math.pi * (step - nearest) / periods[idx])
        )

    for s in [0, 1, 50, 99, 100, 101, 5000, 100099]:
        np.testing.assert_allclose(float(sched(s)), ref(s), rtol=1e-5)


def test_cosine_cyclic_restart_boundary():
    """At a step exactly on a restart boundary the reference's
    get_position_from_periods (`iteration <= period`) keeps the OLD period:
    lr(step=100) with periods [100, X] is eta_mins[0], not the restarted
    peak base_lr*weight[1]."""
    sched = cosine_annealing_restart_cyclic(
        1e-3, [100, 900], [1.0, 0.5], [1e-5, 1e-7]
    )
    np.testing.assert_allclose(float(sched(100)), 1e-5, rtol=1e-5)
    # one step later we are in period 1 at its start (frac tiny, lr near peak)
    assert float(sched(101)) > 1e-4


def test_multistep_restart():
    sched = multistep_restart(1.0, milestones=[10, 20], gamma=0.1)
    assert float(sched(0)) == 1.0
    np.testing.assert_allclose(float(sched(10)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 0.01, rtol=1e-6)


@pytest.mark.slow  # compile-heavy; contract also covered in fast tier/dryrun
def test_train_step_reduces_loss():
    tcfg = TrainConfig(lr=1e-3, fft_weight=0.1)
    params = init_wavemamba(jax.random.PRNGKey(0), TINY)
    state = create_train_state(params, tcfg)
    step = make_train_step(TINY, tcfg)
    rng = np.random.RandomState(0)
    lq = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    gt = jnp.clip(lq * 4.0, 0, 1)
    state, m0 = step(state, lq, gt)
    for _ in range(8):
        state, m = step(state, lq, gt)
    assert float(m["total"]) < float(m0["total"])
    assert int(state["step"]) == 9


@pytest.mark.slow  # compile-heavy; contract also covered in fast tier/dryrun
def test_train_step_sharded_matches_single():
    """Data-parallel step over an 8-device mesh must match single-device."""
    tcfg = TrainConfig(lr=1e-3, ema_decay=0.9)
    params = init_wavemamba(jax.random.PRNGKey(1), TINY)
    rng = np.random.RandomState(1)
    lq = jnp.asarray(rng.rand(8, 16, 16, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(8, 16, 16, 3), jnp.float32)

    mesh = make_mesh(8)
    s8 = replicate(mesh, create_train_state(params, tcfg))

    # Run the single-device step second: its donate_argnums consumes the
    # state buffers, so the mesh state must be materialized first.
    s1 = create_train_state(jax.tree_util.tree_map(jnp.copy, params), tcfg)
    m_single = make_train_step(TINY, tcfg)(s1, lq, gt)[1]
    batch = shard_batch(mesh, {"lq": lq, "gt": gt})
    s8, m_mesh = make_train_step(TINY, tcfg, mesh)(s8, batch["lq"], batch["gt"])
    np.testing.assert_allclose(
        float(m_mesh["total"]), float(m_single["total"]), rtol=1e-5
    )
    assert "ema" in s8


@pytest.mark.slow  # compile-heavy; contract also covered in fast tier/dryrun
def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


@pytest.mark.slow  # compile-heavy; contract also covered in fast tier/dryrun
def test_tiled_apply_mesh_matches_single():
    """Mesh-sharded tiled inference must equal single-device tiled output."""
    from wavemamba_tpu.models import wavemamba as wm
    from wavemamba_tpu.models.tiling import tiled_apply, tiled_apply_mesh

    params = wm.init_wavemamba(jax.random.PRNGKey(0), TINY)
    img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 128, 3)), np.float32
    )
    fwd = jax.jit(lambda t: wm.wavemamba_apply(params, TINY, t))
    single = tiled_apply(lambda t: np.asarray(fwd(jnp.asarray(t))), img,
                         tile_size=48, tile_pad=8, tile_batch=4)
    mesh = make_mesh(4)
    sharded = tiled_apply_mesh(wm.wavemamba_apply, params, TINY, img, mesh,
                               tile_size=48, tile_pad=8)
    np.testing.assert_allclose(sharded, single, atol=2e-5)
