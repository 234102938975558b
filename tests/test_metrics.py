"""Metric parity vs the reference's `comput_psnr_ssim.py` (loaded directly
as an oracle; its CUDA-only 3-D SSIM path is redirected to CPU)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from wavemamba_tpu.metrics import build_metric
from wavemamba_tpu.metrics.psnr_ssim import calculate_psnr, calculate_ssim

REF = "/root/reference/comput_psnr_ssim.py"


@pytest.fixture(scope="module")
def ref_metrics():
    if not os.path.exists(REF):
        pytest.skip("reference repo not mounted")
    import torch
    import types

    # The reference file imports skimage and basicsr.matlab_functions but
    # shadows/ignores them with local definitions — stub both.
    for name in ["skimage", "skimage.metrics"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["skimage"].metrics = sys.modules["skimage.metrics"]
    for name in ["basicsr", "basicsr.utils", "basicsr.utils.matlab_functions"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["basicsr"].utils = sys.modules["basicsr.utils"]
    sys.modules["basicsr.utils"].matlab_functions = sys.modules["basicsr.utils.matlab_functions"]
    sys.modules["basicsr.utils.matlab_functions"].bgr2ycbcr = None  # shadowed locally

    # Redirect .cuda() to CPU so the reference 3-D SSIM runs here.
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    spec = importlib.util.spec_from_file_location("ref_metrics", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _imgs():
    rs = np.random.RandomState(0)
    a = (rs.rand(40, 52, 3) * 255).astype(np.uint8)
    noise = rs.randn(40, 52, 3) * 10
    b = np.clip(a.astype(np.float64) + noise, 0, 255).astype(np.uint8)
    return a, b


def test_psnr_parity(ref_metrics):
    a, b = _imgs()
    for crop, y in [(1, True), (0, False), (4, True)]:
        mine = calculate_psnr(a, b, crop_border=crop, test_y_channel=y)
        theirs = ref_metrics.calculate_psnr(a, b, crop_border=crop, test_y_channel=y)
        np.testing.assert_allclose(mine, theirs, rtol=1e-6)


def test_ssim_y_parity(ref_metrics):
    a, b = _imgs()
    mine = calculate_ssim(a, b, crop_border=1, test_y_channel=True)
    theirs = ref_metrics.calculate_ssim(a, b, crop_border=1, test_y_channel=True)
    np.testing.assert_allclose(mine, theirs, rtol=1e-5)


def test_ssim_3d_parity(ref_metrics):
    a, b = _imgs()
    mine = calculate_ssim(a, b, crop_border=0, test_y_channel=False)
    theirs = ref_metrics.calculate_ssim(a, b, crop_border=0, test_y_channel=False)
    np.testing.assert_allclose(mine, theirs, rtol=1e-4)


def test_identical_images():
    a, _ = _imgs()
    assert calculate_psnr(a, a) == float("inf")
    np.testing.assert_allclose(calculate_ssim(a, a), 1.0, atol=1e-9)


def test_build_metric_factory():
    a, b = _imgs()
    psnr = build_metric({"type": "psnr", "crop_border": 4, "test_y_channel": True})
    assert 20 < psnr(a, b) < 40
    with pytest.raises(ValueError):
        build_metric({"type": "lpips"})  # requires weights_path
    with pytest.raises(KeyError):
        build_metric({"type": "nope"})


def test_lpips_graph_shapes():
    import jax
    import jax.numpy as jnp

    from wavemamba_tpu.metrics.lpips import init_lpips_params, lpips

    params = init_lpips_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 2 - 1
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 2 - 1
    d = lpips(params, x, y)
    assert d.shape == (2,)
    assert np.isfinite(np.asarray(d)).all()
    np.testing.assert_allclose(np.asarray(lpips(params, x, x)), 0.0, atol=1e-6)


def test_matlab_imresize_parity(ref_metrics):
    import torch

    from wavemamba_tpu.utils.matlab import imresize

    rs = np.random.RandomState(3)
    img = rs.rand(37, 45, 3)
    for scale in [0.5, 0.25, 2.0, 1.0 / 3.0]:
        theirs = ref_metrics.imresize(torch.from_numpy(img.transpose(2, 0, 1)), scale, True)
        mine = imresize(img, scale, True)
        np.testing.assert_allclose(mine, theirs.numpy().transpose(1, 2, 0), atol=1e-6)
