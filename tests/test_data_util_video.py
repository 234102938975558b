"""Video-sequence data helpers vs the reference's semantics
(`basicsr/data/data_util.py:12-87,338-390`)."""

import numpy as np
import torch
import torch.nn.functional as F

from wavemamba_tpu.data.data_util import (
    duf_downsample,
    generate_frame_indices,
    generate_gaussian_kernel,
    read_img_seq,
)


def test_generate_frame_indices_reference_examples():
    # the examples documented at data_util.py:46-53 (crt_idx=0, num_frames=5)
    assert generate_frame_indices(0, 100, 5, "replicate") == [0, 0, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "reflection") == [2, 1, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "reflection_circle") == [4, 3, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "circle") == [3, 4, 0, 1, 2]
    # right boundary
    assert generate_frame_indices(99, 100, 5, "replicate") == [97, 98, 99, 99, 99]
    assert generate_frame_indices(99, 100, 5, "reflection") == [97, 98, 99, 98, 97]


def test_duf_downsample_matches_torch():
    """NHWC jax version vs the reference's torch math (reflect pad +
    depthwise gaussian conv stride=scale + 2px crop)."""
    rs = np.random.RandomState(0)
    t, h, w, c = 2, 24, 20, 3
    x = rs.rand(t, h, w, c).astype(np.float32)
    for scale in (2, 4):
        ours = np.asarray(duf_downsample(x, kernel_size=13, scale=scale))

        xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).reshape(-1, 1, h, w)
        pad = 13 // 2 + scale * 2
        xt = F.pad(xt, (pad, pad, pad, pad), "reflect")
        k = torch.from_numpy(
            generate_gaussian_kernel(13, 0.4 * scale).astype(np.float32)
        )[None, None]
        yt = F.conv2d(xt, k, stride=scale)[:, :, 2:-2, 2:-2]
        yt = yt.reshape(t, c, yt.shape[-2], yt.shape[-1]).numpy().transpose(0, 2, 3, 1)
        assert ours.shape == yt.shape
        np.testing.assert_allclose(ours, yt, rtol=1e-5, atol=1e-6)


def test_read_img_seq(tmp_path):
    import cv2

    rs = np.random.RandomState(1)
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"{i:03d}.png"),
                    rs.randint(0, 256, (16, 12, 3), np.uint8))
    seq = read_img_seq(str(tmp_path))
    assert seq.shape == (3, 16, 12, 3)
    assert seq.dtype == np.float32 and 0.0 <= seq.min() and seq.max() <= 1.0
    seq2 = read_img_seq(str(tmp_path), require_mod_crop=True, scale=8)
    assert seq2.shape == (3, 16, 8, 3)
