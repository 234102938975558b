"""transfer_dtype: uint8 — ship uint8 batches, normalize on device.

The uint8 item must be exactly 255x the float path's crop (same RNG), and
a train step fed uint8 must match a step fed the equivalent float batch
bit-for-bit (the in-jit cast is x.astype(f32)/255, the same math the host
path uses)."""

import random

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wavemamba_tpu.data.loader import build_dataset, device_prefetch


@pytest.fixture(scope="module")
def pairs(tmp_path_factory):
    root = tmp_path_factory.mktemp("u8data")
    rs = np.random.RandomState(5)
    for sub in ("gt", "input"):
        (root / sub).mkdir()
    for i in range(2):
        gt = (rs.rand(48, 40, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "gt" / f"{i}.png"), gt)
        cv2.imwrite(str(root / "input" / f"{i}.png"), (gt * 0.4).astype(np.uint8))
    return root


def _opt(root, **kw):
    return {
        "type": "PairedImageDataset",
        "dataroot_gt": str(root / "gt"),
        "dataroot_lq": str(root / "input"),
        "io_backend": {"type": "disk"},
        "phase": "train",
        "scale": 1,
        "gt_size": 32,
        "geometric_augs": True,
        **kw,
    }


def test_uint8_items_match_float_path(pairs):
    ds_u8 = build_dataset(_opt(pairs, transfer_dtype="uint8"))
    ds_f32 = build_dataset(_opt(pairs, use_native=False))
    random.seed(11)
    a = ds_u8[0]
    random.seed(11)
    b = ds_f32[0]
    assert a["gt"].dtype == np.uint8 and a["lq"].dtype == np.uint8
    np.testing.assert_allclose(a["gt"].astype(np.float32) / 255.0, b["gt"],
                               atol=1e-7)
    np.testing.assert_allclose(a["lq"].astype(np.float32) / 255.0, b["lq"],
                               atol=1e-7)


@pytest.mark.slow  # compile-heavy; contract also covered in fast tier/dryrun
def test_train_step_uint8_matches_float(pairs):
    from wavemamba_tpu.models.wavemamba import WaveMambaConfig, init_wavemamba
    from wavemamba_tpu.train.trainer import (
        TrainConfig, create_train_state, make_train_step)

    cfg = WaveMambaConfig(wf=8, n_l_blocks=(1, 1, 1), n_h_blocks=(1, 1, 1),
                          scan_chunk=16)
    tcfg = TrainConfig(ema_decay=0.0)
    params = init_wavemamba(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    lq_u8 = (rs.rand(1, 32, 32, 3) * 255).astype(np.uint8)
    gt_u8 = (rs.rand(1, 32, 32, 3) * 255).astype(np.uint8)

    s1 = create_train_state(params, tcfg)
    s2 = jax.tree_util.tree_map(jnp.copy, s1)
    step = make_train_step(cfg, tcfg, None)
    s1, m1 = step(s1, jnp.asarray(lq_u8), jnp.asarray(gt_u8))
    s2, m2 = step(s2, jnp.asarray(lq_u8, jnp.float32) / 255.0,
                  jnp.asarray(gt_u8, jnp.float32) / 255.0)
    # Not bit-identical: XLA fuses the in-jit /255 into downstream ops with
    # different rounding than a host-normalized input (observed 1-ulp loss
    # delta), and AdamW's 1/(sqrt(v)+eps) amplifies that for near-zero
    # grads. Near-equality is the contract.
    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=1e-6)
    leaves1 = jax.tree_util.tree_leaves(s1["params"])
    leaves2 = jax.tree_util.tree_leaves(s2["params"])
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_device_prefetch_threaded_order():
    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(7)]
    out = list(device_prefetch(iter(batches), depth=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert float(np.asarray(b["x"])[0, 0]) == i


def test_device_prefetch_early_break():
    batches = ({"x": np.full((2,), i, np.float32)} for i in range(100))
    gen = device_prefetch(batches, depth=2)
    first = next(gen)
    assert float(np.asarray(first["x"])[0]) == 0
    gen.close()  # must not hang or leak a blocked worker
