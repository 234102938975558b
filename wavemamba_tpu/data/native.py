"""ctypes bindings for the native data-loader core (native/wavedata.cc).

Auto-builds `libwavedata.so` with g++ on first use; every entry point has a
numpy fallback so the framework works without a toolchain. The native path
fuses crop + dihedral augment + BGR->RGB + normalize + batch collate into
one threaded C++ pass (see wavedata.cc header).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libwavedata.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.wd_paired_crop_augment.argtypes = [
        u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p,
    ]
    lib.wd_batch_paired_crop_augment.argtypes = [
        ctypes.POINTER(u8p), ctypes.POINTER(u8p), i32p, i32p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int, f32p, f32p, ctypes.c_int,
    ]
    lib.wd_to_float_rgb.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _as_u8p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def paired_crop_augment(gt, lq, top, left, gt_size, mode, bgr2rgb=True):
    """Deterministic single-pair crop+augment. gt/lq: uint8 HWC (same size).

    Returns (gt_out, lq_out) float32 (gt_size, gt_size, C) RGB.
    """
    lib = _load()
    h, w, c = gt.shape
    gt = np.ascontiguousarray(gt)
    lq = np.ascontiguousarray(lq)
    out_gt = np.empty((gt_size, gt_size, c), np.float32)
    out_lq = np.empty((gt_size, gt_size, c), np.float32)
    if lib is None:
        raise RuntimeError("native library unavailable")
    lib.wd_paired_crop_augment(
        _as_u8p(gt), _as_u8p(lq), h, w, c, top, left, gt_size, mode,
        int(bgr2rgb),
        out_gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_lq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out_gt, out_lq


def batch_paired_crop_augment(gts, lqs, gt_size, seed, geometric=True,
                              bgr2rgb=True, n_threads=0):
    """gts/lqs: lists of uint8 HWC arrays (per-item sizes may differ).

    Returns (gt_batch, lq_batch) float32 (N, S, S, C) RGB. Deterministic in
    (seed, item index). Threaded in C++ (n_threads=0 -> cpu count).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(gts)
    c = gts[0].shape[2]
    gts = [np.ascontiguousarray(g) for g in gts]
    lqs = [np.ascontiguousarray(l) for l in lqs]
    hs = np.asarray([g.shape[0] for g in gts], np.int32)
    ws = np.asarray([g.shape[1] for g in gts], np.int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    gt_ptrs = (u8p * n)(*[_as_u8p(g) for g in gts])
    lq_ptrs = (u8p * n)(*[_as_u8p(l) for l in lqs])
    out_gt = np.empty((n, gt_size, gt_size, c), np.float32)
    out_lq = np.empty((n, gt_size, gt_size, c), np.float32)
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 1)
    lib.wd_batch_paired_crop_augment(
        gt_ptrs, lq_ptrs,
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n, c, gt_size, np.uint64(seed), int(geometric), int(bgr2rgb),
        out_gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_lq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out_gt, out_lq


def to_float_rgb(img):
    """uint8 HWC BGR -> float32 HWC RGB via the native pass (with fallback)."""
    lib = _load()
    img = np.ascontiguousarray(img)
    if lib is None:
        out = img[..., ::-1].astype(np.float32) / 255.0
        return np.ascontiguousarray(out)
    h, w, c = img.shape
    out = np.empty((h, w, c), np.float32)
    lib.wd_to_float_rgb(
        _as_u8p(img), h, w, c, 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
