"""Every artifact shipped under ckpt/ stays loadable and sane.

Pins the committed checkpoints (reference-format ``.pth``, trained on chip
in rounds 2-4) against converter regressions, and the committed ``.wmx``
deployment artifact against loader/manifest regressions. A brightening
sanity check stands in for full val (these are LLIE models: output mean
must exceed a dark input's mean).
"""

import glob
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PTHS = sorted(glob.glob(os.path.join(REPO, "ckpt", "*.pth")))
WMXS = sorted(glob.glob(os.path.join(REPO, "ckpt", "*.wmx")))


@pytest.mark.parametrize("path", PTHS, ids=[os.path.basename(p) for p in PTHS])
def test_shipped_pth_loads_and_brightens(path):
    import jax
    import jax.numpy as jnp

    from wavemamba_tpu.convert.torch_import import load_wavemamba_checkpoint
    from wavemamba_tpu.models import WaveMambaConfig, param_count, wavemamba_apply

    cfg = WaveMambaConfig()  # every shipped ckpt is the flagship config
    params = load_wavemamba_checkpoint(path)
    assert param_count(params) == 1_512_718  # wavemamba_arch.py param total

    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3) * 0.12,
                    jnp.float32)
    y = np.asarray(jax.jit(lambda p, t: wavemamba_apply(p, cfg, t))(params, x))
    assert np.isfinite(y).all()
    assert float(y.mean()) > float(np.asarray(x).mean())  # it brightens


@pytest.mark.parametrize("path", WMXS, ids=[os.path.basename(p) for p in WMXS])
def test_shipped_wmx_manifest_intact(path):
    """The committed .wmx passes the loader's weight-checksum gate and its
    manifest records the flagship config (deploy.py:254-291)."""
    from wavemamba_tpu.deploy import load_exported

    model = load_exported(path)  # checksum verified inside load
    m = model.manifest
    assert m["model"] == "WaveMamba" and m["config"]["wf"] == 32
    assert m["platforms"] == ["tpu"] and m["io_dtype"] == "uint8"
    assert m["param_bytes"] == sum(int(np.prod(p.shape)) * p.dtype.itemsize
                                   for p in model._flat)
