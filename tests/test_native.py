"""Native C++ loader core vs the numpy transform path."""

import numpy as np
import pytest

from wavemamba_tpu.data import native
from wavemamba_tpu.data.transforms import data_augmentation

pytestmark = pytest.mark.skipif(not native.available(), reason="g++/so unavailable")


def test_crop_augment_matches_numpy_all_modes():
    rs = np.random.RandomState(0)
    gt = (rs.rand(24, 30, 3) * 255).astype(np.uint8)
    lq = (rs.rand(24, 30, 3) * 255).astype(np.uint8)
    top, left, size = 3, 5, 16
    for mode in range(8):
        ngt, nlq = native.paired_crop_augment(gt, lq, top, left, size, mode)
        # numpy reference: crop -> dihedral -> BGR->RGB -> /255
        ref_gt = data_augmentation(gt[top : top + size, left : left + size], mode)
        ref_gt = ref_gt[..., ::-1].astype(np.float32) / 255.0
        ref_lq = data_augmentation(lq[top : top + size, left : left + size], mode)
        ref_lq = ref_lq[..., ::-1].astype(np.float32) / 255.0
        np.testing.assert_allclose(ngt, ref_gt, atol=1e-7, err_msg=f"mode {mode}")
        np.testing.assert_allclose(nlq, ref_lq, atol=1e-7, err_msg=f"mode {mode}")


def test_batch_deterministic_and_threaded():
    rs = np.random.RandomState(1)
    gts = [(rs.rand(40, 44, 3) * 255).astype(np.uint8) for _ in range(6)]
    lqs = [(rs.rand(40, 44, 3) * 255).astype(np.uint8) for _ in range(6)]
    a_gt, a_lq = native.batch_paired_crop_augment(gts, lqs, 16, seed=7, n_threads=1)
    b_gt, b_lq = native.batch_paired_crop_augment(gts, lqs, 16, seed=7, n_threads=4)
    np.testing.assert_array_equal(a_gt, b_gt)
    np.testing.assert_array_equal(a_lq, b_lq)
    c_gt, _ = native.batch_paired_crop_augment(gts, lqs, 16, seed=8)
    assert not np.array_equal(a_gt, c_gt)
    assert a_gt.shape == (6, 16, 16, 3) and a_gt.dtype == np.float32
    assert a_gt.min() >= 0 and a_gt.max() <= 1


def test_to_float_rgb():
    rs = np.random.RandomState(2)
    img = (rs.rand(10, 12, 3) * 255).astype(np.uint8)
    out = native.to_float_rgb(img)
    np.testing.assert_allclose(out, img[..., ::-1].astype(np.float32) / 255.0)
