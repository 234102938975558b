"""Image filtering helpers (`basicsr/utils/img_process_util.py:7-83`):
batched 2-D filtering and USM (unsharp-mask) sharpening, NHWC/JAX."""

from __future__ import annotations

import cv2
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def filter2d(img, kernel):
    """Per-channel 2-D filter. img: (B, H, W, C); kernel: (k, k) or (B, k, k)."""
    b, h, w, c = img.shape
    k = kernel.shape[-1]
    if kernel.ndim == 2:
        kern = jnp.broadcast_to(kernel[:, :, None, None], (k, k, 1, c)).astype(img.dtype)
        dn = lax.conv_dimension_numbers(img.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
        pad = k // 2
        return lax.conv_general_dilated(
            img, kern, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=dn, feature_group_count=c,
        )
    # Per-sample kernels: vmap the shared-kernel case.
    return jax.vmap(lambda im, ke: filter2d(im[None], ke)[0])(img, kernel)


def usm_sharp(img, weight=0.5, radius=50, threshold=10):
    """Unsharp masking with a soft edge mask (reference semantics).

    img: HWC float [0, 1] numpy. Host-side (cv2 Gaussian blur).
    """
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype(np.float32)
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)
    sharp = np.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img
