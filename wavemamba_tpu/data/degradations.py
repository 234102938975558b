"""Blind-SR degradation synthesis (`basicsr/data/bsrgan_util.py`, 762 LoC).

Compact host-side (numpy/cv2) reimplementation of the BSRGAN degradation
toolbox: random isotropic/anisotropic Gaussian blur kernels, bicubic/area
down-sampling, Gaussian (gray/color) and Poisson noise, JPEG compression,
and the shuffled composite `degradation_bsrgan` pipeline. Unused by the
shipped Wave-Mamba configs (SURVEY.md §2.3) but part of the data-layer
surface for blind restoration training.
"""

from __future__ import annotations

import random

import cv2
import numpy as np

from wavemamba_tpu.utils.matlab import imresize


def gaussian_kernel(size=21, sigma1=1.6, sigma2=None, theta=0.0):
    """Isotropic (sigma2 None) or rotated anisotropic Gaussian kernel."""
    if sigma2 is None:
        sigma2 = sigma1
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    cov = rot @ np.diag([sigma1**2, sigma2**2]) @ rot.T
    g = np.arange(size) - size // 2
    xx, yy = np.meshgrid(g, g)
    coords = np.stack([xx, yy], axis=-1)
    inv = np.linalg.inv(cov)
    k = np.exp(-0.5 * np.einsum("hwi,ij,hwj->hw", coords, inv, coords))
    return (k / k.sum()).astype(np.float32)


def random_blur_kernel(size=21):
    if random.random() < 0.5:
        return gaussian_kernel(size, sigma1=random.uniform(0.1, 2.8))
    return gaussian_kernel(
        size,
        sigma1=random.uniform(0.5, 8.0),
        sigma2=random.uniform(0.5, 8.0),
        theta=random.uniform(0, np.pi),
    )


def add_blur(img, size=21):
    k = random_blur_kernel(size)
    return cv2.filter2D(img, -1, k, borderType=cv2.BORDER_REFLECT)


def add_resize(img, scale_range=(0.5, 1.2)):
    s = random.uniform(*scale_range)
    mode = random.choice([cv2.INTER_LINEAR, cv2.INTER_CUBIC, cv2.INTER_AREA])
    out = cv2.resize(img, None, fx=s, fy=s, interpolation=mode)
    return np.clip(out, 0, 1)


def add_gaussian_noise(img, sigma_range=(2, 25), gray_prob=0.4):
    sigma = random.uniform(*sigma_range) / 255.0
    if random.random() < gray_prob:
        noise = np.random.randn(*img.shape[:2], 1).astype(np.float32) * sigma
    else:
        noise = np.random.randn(*img.shape).astype(np.float32) * sigma
    return np.clip(img + noise, 0, 1)


def add_poisson_noise(img, scale_range=(0.05, 3.0)):
    scale = random.uniform(*scale_range)
    vals = 10 ** (2 * random.random() + 2.0)
    noisy = np.random.poisson(np.clip(img, 0, 1) * vals) / vals
    return np.clip(img + (noisy - img) * scale, 0, 1).astype(np.float32)


def add_jpeg(img, quality_range=(30, 95)):
    q = random.randint(*quality_range)
    ok, enc = cv2.imencode(".jpg", (img[..., ::-1] * 255).round().astype(np.uint8),
                           [cv2.IMWRITE_JPEG_QUALITY, q])
    dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
    return dec.astype(np.float32) / 255.0


def degradation_bsrgan(img_gt, scale=4, shuffle_prob=0.5, jpeg_last=True):
    """GT (HWC RGB [0,1]) -> (lq, gt) with a randomly ordered degradation
    chain (blur, resize, gaussian/poisson noise, jpeg), final resize to
    1/scale of the GT size."""
    h, w = img_gt.shape[:2]
    img = img_gt.copy()
    ops = [add_blur, add_resize, add_gaussian_noise, add_poisson_noise]
    if random.random() < shuffle_prob:
        random.shuffle(ops)
    for op in ops:
        if random.random() < 0.7:
            img = op(img)
    img = np.clip(
        imresize(img, (h // scale) / img.shape[0]).astype(np.float32), 0, 1
    )
    if img.shape[:2] != (h // scale, w // scale):
        img = cv2.resize(img, (w // scale, h // scale), interpolation=cv2.INTER_CUBIC)
        img = np.clip(img, 0, 1)
    if jpeg_last:
        img = add_jpeg(img)
    return img.astype(np.float32), img_gt
