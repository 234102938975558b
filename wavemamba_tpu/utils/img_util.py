"""Image IO / conversion (`basicsr/utils/img_util.py`), NHWC-native.

The reference works in BGR uint8 (cv2) on disk and RGB CHW float tensors in
the model. Here the model is NHWC RGB float; disk IO stays BGR uint8 via cv2
for byte-exact parity with the reference's metrics."""

from __future__ import annotations

import os

import cv2
import numpy as np


def imfrombytes(content: bytes, flag="color", float32=False):
    """Decode image bytes -> BGR HWC (`img_util.py:101-125`)."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {
        "color": cv2.IMREAD_COLOR,
        "grayscale": cv2.IMREAD_GRAYSCALE,
        "unchanged": cv2.IMREAD_UNCHANGED,
    }
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def imread(path, flag="color", float32=False):
    with open(path, "rb") as f:
        return imfrombytes(f.read(), flag=flag, float32=float32)


def imwrite(img, file_path, params=None, auto_mkdir=True):
    """Write BGR uint8 HWC (`img_util.py:185-201`)."""
    if auto_mkdir:
        dir_name = os.path.abspath(os.path.dirname(file_path))
        os.makedirs(dir_name, exist_ok=True)
    ok = cv2.imwrite(file_path, img, params or [])
    if not ok:
        raise IOError("Failed in writing images.")
    return ok


def img2batch(img, bgr2rgb=True, float32=True):
    """HWC BGR (uint8 or float) -> (1, H, W, C) RGB float32 in [0,1].

    NHWC replacement for `img2tensor` (`img_util.py:9-33`)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    if bgr2rgb and img.ndim == 3 and img.shape[2] == 3:
        img = img[..., ::-1]
    if float32:
        img = img.astype(np.float32)
    return img[None].copy()


def batch2img(batch, rgb2bgr=True, min_max=(0, 1)):
    """(1|B, H, W, C) RGB float -> uint8 BGR HWC (first item).

    NHWC replacement for `tensor2img` (`img_util.py:36-98`): clamp to
    min_max, rescale to [0, 1], *255 round."""
    img = np.asarray(batch)
    if img.ndim == 4:
        img = img[0]
    img = np.clip(img, min_max[0], min_max[1])
    img = (img - min_max[0]) / (min_max[1] - min_max[0])
    if rgb2bgr and img.ndim == 3 and img.shape[2] == 3:
        img = img[..., ::-1]
    return (img * 255.0).round().astype(np.uint8)


def padding(img_lq, img_gt, gt_size):
    """Reflect-pad a pair up to gt_size (`img_util.py:150-168`)."""
    h, w = img_lq.shape[:2]
    h_pad = max(0, gt_size - h)
    w_pad = max(0, gt_size - w)
    if h_pad == 0 and w_pad == 0:
        return img_lq, img_gt
    img_lq = cv2.copyMakeBorder(img_lq, 0, h_pad, 0, w_pad, cv2.BORDER_REFLECT)
    img_gt = cv2.copyMakeBorder(img_gt, 0, h_pad, 0, w_pad, cv2.BORDER_REFLECT)
    if img_lq.ndim == 2:
        img_lq = img_lq[..., None]
    if img_gt.ndim == 2:
        img_gt = img_gt[..., None]
    return img_lq, img_gt


def crop_border(imgs, crop_size):
    """Crop `crop_size` pixels from each border (`img_util.py:204-224`)."""
    if crop_size == 0:
        return imgs
    if isinstance(imgs, list):
        return [v[crop_size:-crop_size, crop_size:-crop_size, ...] for v in imgs]
    return imgs[crop_size:-crop_size, crop_size:-crop_size, ...]
