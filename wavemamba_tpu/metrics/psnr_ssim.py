"""MATLAB-parity PSNR / SSIM — the evaluation protocol of the reference
(`comput_psnr_ssim.py:387-438` calculate_psnr, :596-667 calculate_ssim with
`_ssim_cly` (Y-channel 2-D Gaussian) and `_ssim_3d` (11^3 3-D Gaussian)).

Host-side float64 numpy/scipy (metrics are not a TPU hot path; the reference
even runs its 3-D SSIM conv on GPU purely for speed — scipy.ndimage with
replicate padding is numerically identical). Inputs are HWC numpy arrays in
[0, 255] uint8 (BGR, as from cv2.imread) or [0, 1] float.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import correlate1d

from wavemamba_tpu.utils.color import to_y_channel


def _gaussian_kernel_1d(size=11, sigma=1.5):
    """cv2.getGaussianKernel parity."""
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return k / k.sum()


def _prep(img1, img2, crop_border, input_order):
    if img1.shape != img2.shape:
        raise ValueError(f"Image shapes are different: {img1.shape}, {img2.shape}.")
    if input_order not in ("HWC", "CHW"):
        raise ValueError(f"Wrong input_order {input_order}")
    if input_order == "CHW":
        img1 = np.transpose(img1, (1, 2, 0))
        img2 = np.transpose(img2, (1, 2, 0))
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    return img1, img2


def calculate_psnr(img1, img2, crop_border=1, input_order="HWC", test_y_channel=True):
    """PSNR with auto max-value (1 vs 255) and optional Y-channel."""
    img1, img2 = _prep(img1, img2, crop_border, input_order)
    if test_y_channel:
        img1 = to_y_channel(img1)
        img2 = to_y_channel(img2)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    max_value = 1.0 if img1.max() <= 1 else 255.0
    return 20.0 * np.log10(max_value / np.sqrt(mse))


def _ssim_cly(img1, img2):
    """Y-channel SSIM: 2-D 11x11 Gaussian, replicate border, 255 range."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    k = _gaussian_kernel_1d()

    def f(x):
        # Separable 2-D Gaussian: per-axis replicate padding commutes with
        # correlation along the other axis, so two 1-D passes are exactly
        # the dense outer(k, k) correlate at ~1/5 the MACs.
        return correlate1d(correlate1d(x, k, axis=0, mode="nearest"),
                           k, axis=1, mode="nearest")

    mu1, mu2 = f(img1), f(img2)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = f(img1**2) - mu1_sq
    s2 = f(img2**2) - mu2_sq
    s12 = f(img1 * img2) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return float(ssim_map.mean())


def _ssim_3d(img1, img2, max_value):
    """Color SSIM via an 11^3 3-D Gaussian over (H, W, C), replicate pad —
    the reference's CUDA Conv3d path (`comput_psnr_ssim.py:506-555`) on host."""
    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    k = _gaussian_kernel_1d()

    def f(x):
        # Separable 11^3 Gaussian as three 1-D passes (exact, see _ssim_cly
        # note): 33 MACs/voxel instead of the dense kernel's 1331 — the
        # difference between seconds and tens of ms per 512^2 validation
        # image on a 1-core host.
        for ax in range(3):
            x = correlate1d(x, k, axis=ax, mode="nearest")
        return x

    mu1, mu2 = f(img1), f(img2)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = f(img1**2) - mu1_sq
    s2 = f(img2**2) - mu2_sq
    s12 = f(img1 * img2) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return float(ssim_map.mean())


def calculate_ssim(img1, img2, crop_border=1, input_order="HWC", test_y_channel=True):
    img1, img2 = _prep(img1, img2, crop_border, input_order)
    if test_y_channel:
        img1 = to_y_channel(img1).astype(np.float64)
        img2 = to_y_channel(img2).astype(np.float64)
        return _ssim_cly(img1[..., 0], img2[..., 0])
    max_value = 1.0 if img1.max() <= 1 else 255.0
    return _ssim_3d(img1, img2, max_value)
