"""Oracle parity for the BSRGAN degradation toolbox vs
`/root/reference/basicsr/data/bsrgan_util.py`.

The reference targets old scipy (`ndimage.filters`, `interp2d`, both
removed in modern scipy); the deterministic kernel/degradation math is
compared directly, with a shim for the removed convolve namespace.
Stochastic ops are checked under identical seeded RNG streams where the
call sequences line up.
"""

import random
import types

import numpy as np
import pytest
import scipy.ndimage

from wavemamba_tpu.data import degradations as deg

import torch_oracle


@pytest.fixture(scope="module")
def ref():
    mod = torch_oracle.load_reference_module(
        "/root/reference/basicsr/data/bsrgan_util.py"
    )
    # scipy>=1.15 removed the ndimage.filters alias namespace the
    # reference calls; same function, modern location.
    mod.ndimage = types.SimpleNamespace(
        filters=types.SimpleNamespace(convolve=scipy.ndimage.convolve),
        convolve=scipy.ndimage.convolve,
    )
    # scipy>=1.15 also removed the top-level scipy.finfo alias.
    mod.scipy = types.SimpleNamespace(finfo=np.finfo)
    return mod


def test_gm_blur_kernel_matches(ref):
    k_ref = ref.gm_blur_kernel(mean=[0, 0], cov=[[4.0, 1.0], [1.0, 2.0]], size=15)
    k = deg.gm_blur_kernel(mean=[0, 0], cov=[[4.0, 1.0], [1.0, 2.0]], size=15)
    np.testing.assert_allclose(k, k_ref, atol=1e-12)


def test_anisotropic_gaussian_matches(ref):
    for theta, l1, l2 in ((0.3, 6.0, 2.0), (2.1, 1.0, 1.0), (np.pi, 8.0, 0.5)):
        k_ref = ref.anisotropic_Gaussian(ksize=15, theta=theta, l1=l1, l2=l2)
        k = deg.anisotropic_gaussian(ksize=15, theta=theta, l1=l1, l2=l2)
        np.testing.assert_allclose(k, k_ref, atol=1e-12)


def test_analytic_kernel_matches(ref):
    k = deg.fspecial_gaussian(11, 1.8)
    np.testing.assert_allclose(
        deg.analytic_kernel(k), ref.analytic_kernel(k), atol=1e-12
    )


def test_gen_kernel_matches(ref):
    np.random.seed(7)
    k_ref = ref.gen_kernel(np.array([15, 15]), np.array([4, 4]), 0.6, 10.0, 0.1)
    np.random.seed(7)
    k = deg.gen_kernel((15, 15), (4, 4), 0.6, 10.0, 0.1)
    np.testing.assert_allclose(k, k_ref, atol=1e-12)


def test_fspecial_matches(ref):
    np.testing.assert_allclose(
        deg.fspecial("gaussian", 25, 1.6), ref.fspecial("gaussian", 25, 1.6),
        atol=1e-12)
    np.testing.assert_allclose(
        deg.fspecial("laplacian", 0.3), ref.fspecial("laplacian", 0.3),
        atol=1e-12)


@pytest.fixture()
def img():
    return np.random.RandomState(0).rand(96, 80, 3).astype(np.float32)


def test_degradation_models_match(ref, img):
    k = deg.fspecial_gaussian(15, 2.0)
    np.testing.assert_allclose(
        deg.bicubic_degradation(img, 2), ref.bicubic_degradation(img, 2),
        atol=2e-6)
    np.testing.assert_allclose(
        deg.srmd_degradation(img, k, 2), ref.srmd_degradation(img, k, 2),
        atol=2e-6)
    np.testing.assert_allclose(
        deg.dpsr_degradation(img, k, 2), ref.dpsr_degradation(img, k, 2),
        atol=2e-6)
    np.testing.assert_allclose(
        deg.classical_degradation(img, k, 2),
        ref.classical_degradation(img, k, 2), atol=2e-6)


def test_jpeg_and_crop_match(ref, img):
    random.seed(3)
    a = deg.add_jpeg_noise(img)
    random.seed(3)
    b = ref.add_JPEG_noise(img)
    np.testing.assert_allclose(a, b, atol=1e-6)

    random.seed(5)
    lq_a, hq_a = deg.random_crop(img, np.repeat(np.repeat(img, 2, 0), 2, 1),
                                 sf=2, lq_patchsize=16)
    random.seed(5)
    lq_b, hq_b = ref.random_crop(img, np.repeat(np.repeat(img, 2, 0), 2, 1),
                                 sf=2, lq_patchsize=16)
    np.testing.assert_array_equal(lq_a, lq_b)
    np.testing.assert_array_equal(hq_a, hq_b)


def test_noise_ops_match_seeded(ref, img):
    for mine, theirs in (
        (deg.add_gaussian_noise, ref.add_Gaussian_noise),
        (deg.add_speckle_noise, ref.add_speckle_noise),
        (deg.add_poisson_noise, ref.add_Poisson_noise),
    ):
        for seed in (0, 1, 2):
            random.seed(seed); np.random.seed(seed)
            a = mine(img.copy())
            random.seed(seed); np.random.seed(seed)
            b = theirs(img.copy())
            np.testing.assert_allclose(a, b, atol=1e-6)


def test_blur_matches_seeded(ref, img):
    for seed in (0, 4):
        random.seed(seed); np.random.seed(seed)
        a = deg.add_blur(img.copy(), sf=4)
        random.seed(seed); np.random.seed(seed)
        b = ref.add_blur(img.copy(), sf=4)
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_pipelines_produce_valid_pairs(img):
    """Full composites run end to end with correct shapes/ranges (their
    RNG streams diverge from the reference's at shift_pixel, which the
    reference can't run on modern scipy at all)."""
    big = np.random.RandomState(1).rand(160, 160, 3).astype(np.float32)
    random.seed(0); np.random.seed(0)
    lq, hq = deg.degradation_bsrgan(big, sf=2, lq_patchsize=32)
    assert lq.shape == (32, 32, 3) and hq.shape == (64, 64, 3)
    assert 0.0 <= lq.min() and lq.max() <= 1.0

    random.seed(0); np.random.seed(0)
    lq, hq = deg.degradation_bsrgan_plus(big, sf=2, lq_patchsize=32)
    assert lq.shape == (32, 32, 3) and hq.shape == (64, 64, 3)
    assert 0.0 <= lq.min() and lq.max() <= 1.0
