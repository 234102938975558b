"""Tiled inference for huge frames — TPU-first redesign of `test_tile`
(`basicsr/archs/wavemamba_arch.py:1091-1151`, Real-ESRGAN-style).

Differences from the reference, by design:
  * The reference's `test_tile` crashes as shipped (`self.scale_factor`
    never set, SURVEY.md §2.1); this implementation is scale-1 native.
  * Every tile is extracted at a FIXED padded shape from a reflect-padded
    canvas, so XLA compiles the tile forward exactly once (the reference's
    clamped variable-size tiles would trigger a recompile per shape).
  * Tiles are batched (`tile_batch`) through the network — on TPU a batch of
    tiles keeps the MXU fed far better than one-at-a-time tiles.

Seams: each tile contributes only its central `tile_size` region, computed
with `tile_pad` pixels of real (or reflected, at frame borders) context —
the same seam-free paste-back contract as the reference.
"""

from __future__ import annotations

import numpy as np


def tiled_apply(fn, img, tile_size=240, tile_pad=16, pad_multiple=8, tile_batch=8):
    """img: (1, H, W, C) numpy. fn: (B, h, w, C) -> (B, h, w, C) jittable.

    Returns (1, H, W, C) numpy.
    """
    assert img.ndim == 4 and img.shape[0] == 1
    _, H, W, C = img.shape
    ts, pad = tile_size, tile_pad
    ext = ts + 2 * pad
    ext += (-ext) % pad_multiple  # fixed, lane-friendly tile shape
    extra = ext - ts - 2 * pad  # absorbed into the trailing pad

    ys = list(range(0, H, ts))
    xs = list(range(0, W, ts))
    pad_bottom = ys[-1] + ts + pad + extra - H + pad
    pad_right = xs[-1] + ts + pad + extra - W + pad
    canvas = np.pad(
        img[0], ((pad, max(pad, pad_bottom)), (pad, max(pad, pad_right)), (0, 0)),
        mode="reflect",
    )

    tiles = []
    for y0 in ys:
        for x0 in xs:
            tiles.append(canvas[y0 : y0 + ext, x0 : x0 + ext, :])
    tiles = np.stack(tiles)  # (T, ext, ext, C)

    outs = []
    n = tiles.shape[0]
    for i in range(0, n, tile_batch):
        chunk = tiles[i : i + tile_batch]
        valid = chunk.shape[0]
        if valid < tile_batch:  # keep the jit shape fixed
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], tile_batch - valid, axis=0)], axis=0
            )
        out = np.asarray(fn(chunk))[:valid]
        outs.append(out)
    outs = np.concatenate(outs, axis=0)

    result = np.zeros((H + ts, W + ts, C), img.dtype)
    t = 0
    for y0 in ys:
        for x0 in xs:
            result[y0 : y0 + ts, x0 : x0 + ts, :] = outs[t, pad : pad + ts, pad : pad + ts, :]
            t += 1
    return result[None, :H, :W, :]


def tiled_apply_mesh(apply_fn, params, cfg, img, mesh, tile_size=240,
                     tile_pad=16, pad_multiple=8, tile_batch=None):
    """Mesh-parallel tiled inference: the tile batch is sharded over the
    mesh's 'data' axis (params replicated), so a UHD frame's tiles are
    enhanced by all chips at once — the multi-chip scaling story for 4K/8K
    frames the reference never had (its test_tile is single-GPU serial).

    apply_fn: (params, cfg, x) -> y (the model's apply function).
    """
    import jax

    from wavemamba_tpu.parallel.mesh import batch_sharding, replicated

    n = mesh.devices.size
    if tile_batch is None:
        tile_batch = max(n, (8 // n) * n) if n <= 8 else n
    tile_batch = ((tile_batch + n - 1) // n) * n  # divisible by mesh size

    fn = jax.jit(
        lambda p, t: apply_fn(p, cfg, t),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )

    def run(tiles_np):
        import jax.numpy as jnp

        return np.asarray(fn(params, jnp.asarray(tiles_np)))

    return tiled_apply(run, img, tile_size=tile_size, tile_pad=tile_pad,
                       pad_multiple=pad_multiple, tile_batch=tile_batch)
