"""cache_in_ram: decoded-image RAM cache must be transparent (identical
items) and actually avoid re-decoding (reference re-decodes every epoch,
`basicsr/data/paired_image_dataset.py:84-90`; the cache is a TPU-build
extension for few-core hosts)."""

import cv2
import numpy as np
import pytest

from wavemamba_tpu.data.loader import build_dataset


@pytest.fixture(scope="module")
def tiny_pairs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cachedata")
    rs = np.random.RandomState(3)
    for sub in ("gt", "input"):
        (root / sub).mkdir()
    for i in range(3):
        gt = (rs.rand(24, 20, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "gt" / f"{i}.png"), gt)
        cv2.imwrite(str(root / "input" / f"{i}.png"), (gt * 0.4).astype(np.uint8))
    return root


def _opt(root, **kw):
    return {
        "type": "PairedImageDataset",
        "dataroot_gt": str(root / "gt"),
        "dataroot_lq": str(root / "input"),
        "io_backend": {"type": "disk"},
        "phase": "val",
        **kw,
    }


def test_cached_items_identical(tiny_pairs):
    plain = build_dataset(_opt(tiny_pairs))
    cached = build_dataset(_opt(tiny_pairs, cache_in_ram=True))
    for i in range(3):
        a, b = plain[i], cached[i]
        np.testing.assert_array_equal(a["gt"], b["gt"])
        np.testing.assert_array_equal(a["lq"], b["lq"])
    assert len(cached._cache) == 6  # 3 gt + 3 lq decoded once


def test_cache_hit_skips_decode(tiny_pairs, monkeypatch):
    cached = build_dataset(_opt(tiny_pairs, cache_in_ram=True))
    cached[0]
    import wavemamba_tpu.data.paired_image_dataset as mod

    def boom(*a, **kw):
        raise AssertionError("decode called despite warm cache")

    monkeypatch.setattr(mod, "imfrombytes", boom)
    cached[0]  # served from cache

    plain = build_dataset(_opt(tiny_pairs))
    with pytest.raises(AssertionError):
        plain[0]
