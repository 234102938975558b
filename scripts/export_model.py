#!/usr/bin/env python
"""Build / serve AOT deployment artifacts (see wavemamba_tpu/deploy.py).

Export a checkpoint to a self-contained ``.wmx`` archive::

    python scripts/export_model.py export -w ckpt/WaveMamba_ProcLLIE_BSRGAN_12k.pth \
        --shapes 1088x1920 768x1280 -o wavemamba_1080p.wmx --fast

Serve a folder from the artifact alone (no model code is imported —
deploy.py + jax are the full dependency)::

    python scripts/export_model.py run -a wavemamba_1080p.wmx \
        -i datasets/val/input -o results/served
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_shape(s):
    h, _, w = s.partition("x")
    return (int(h), int(w))


def cmd_export(args):
    from wavemamba_tpu.deploy import export_model
    from wavemamba_tpu.models.wavemamba import WaveMambaConfig
    from wavemamba_tpu.train.checkpoint import load_network

    mk = WaveMambaConfig.fast if args.fast else WaveMambaConfig
    if args.fast and args.target == "tpu":
        # Build the TPU preset regardless of the build host's backend —
        # the AOT export case (CPU host, TPU artifact). fast() alone would
        # sniff the CPU backend and silently degrade to the portable
        # fast_xla preset.
        mk = WaveMambaConfig.fast_tpu
    cfg = mk(wf=args.wf, n_l_blocks=tuple(args.n_l_blocks),
             n_h_blocks=tuple(args.n_h_blocks))
    params = load_network(args.weight)
    shapes = [_parse_shape(s) for s in args.shapes]
    platforms = tuple(args.platforms)
    tile = None
    if args.tile:
        tile = {"size": args.tile, "pad": args.tile_pad,
                "batch": args.tile_batch}
    manifest = export_model(
        params, cfg, shapes, args.out, batch=args.batch, platforms=platforms,
        allow_custom_calls=args.allow_custom_calls, tile=tile,
        mesh_devices=args.mesh_devices, io_dtype=args.io)
    size = os.path.getsize(args.out)
    print(f"wrote {args.out} ({size/1e6:.1f} MB): "
          f"{len(shapes)} program(s) for {manifest['platforms']}, "
          f"{manifest['param_bytes']/1e6:.1f} MB weights")


def cmd_run(args):
    from wavemamba_tpu.deploy import load_exported
    from wavemamba_tpu.utils.img_util import batch2img, img2batch, imread, imwrite
    from wavemamba_tpu.utils.misc import scandir

    model = load_exported(args.artifact, compile_cache=args.compile_cache)
    print(f"artifact: shapes {model.shapes}, platforms "
          f"{model.manifest['platforms']}")
    os.makedirs(args.output, exist_ok=True)
    paths = ([args.input] if os.path.isfile(args.input)
             else sorted(scandir(args.input, full_path=True)))
    def _prep(path):
        img = imread(path)  # BGR uint8
        if model.io_dtype == "uint8":
            # Bytes in, bytes out: BGR->RGB view only; the float conversion
            # and the save-path quantization both run on the device.
            return img[..., ::-1][None]
        return img2batch(img)

    def _save(path, out):
        sr = out[0][..., ::-1] if model.io_dtype == "uint8" else batch2img(out)
        imwrite(sr, os.path.join(args.output, os.path.basename(path)))

    if args.tiled:
        for path in paths:
            t0 = time.time()
            _save(path, model.tiled(_prep(path)))
            print(f"{os.path.basename(path)}: {time.time()-t0:.3f}s", flush=True)
        return
    # Whole-frame serving is pipelined one frame deep: frame i+1 is decoded
    # and dispatched before frame i's result is fetched/encoded, so device
    # compute overlaps the host work and the result transfer
    # (ExportedModel.dispatch).
    pending = None  # (path, handle, t0)
    for path in paths + [None]:
        nxt = None
        if path is not None:
            t0 = time.time()
            nxt = (path, model.dispatch(_prep(path)), t0)
        if pending is not None:
            p, handle, t0 = pending
            _save(p, handle.fetch())
            print(f"{os.path.basename(p)}: {time.time()-t0:.3f}s", flush=True)
        pending = nxt


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("export", help="serialize a checkpoint to .wmx")
    p.add_argument("-w", "--weight", required=True, help=".pth or orbax dir")
    p.add_argument("-o", "--out", required=True, help="output .wmx path")
    p.add_argument("--shapes", nargs="+", required=True,
                   help="static input shapes, e.g. 1088x1920 (pad-multiple "
                        "128 like the reference)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--fast", action="store_true",
                   help="bf16 TPU preset (scan falls back to the portable "
                        "XLA lowering unless --allow_custom_calls)")
    p.add_argument("--allow_custom_calls", action="store_true",
                   help="keep Pallas kernels (TPU-only, jax-version-pinned)")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--tile", type=int, default=0,
                   help="also export a fixed-shape tile program (the >=8K "
                        "serving path; 0 = whole-frame programs only)")
    p.add_argument("--tile_pad", type=int, default=16)
    p.add_argument("--tile_batch", type=int, default=8)
    p.add_argument("--target", choices=["auto", "tpu"], default="auto",
                   help="with --fast: 'tpu' builds the TPU preset even on "
                        "a CPU build host (pair with --allow_custom_calls "
                        "for the Pallas-kernel artifact); 'auto' follows "
                        "the host backend")
    p.add_argument("--io", choices=["float32", "uint8"], default="float32",
                   help="uint8 bakes the byte<->float conversion into the "
                        "program: 8x less host<->device pixel traffic, "
                        "quantization identical to the PNG save path")
    p.add_argument("--mesh_devices", type=int, default=1,
                   help=">1 shards the tile program's batch over a 'data' "
                        "mesh (multi-chip tiled serving; serving host must "
                        "have exactly this many devices)")
    p.add_argument("--wf", type=int, default=32)
    p.add_argument("--n_l_blocks", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--n_h_blocks", type=int, nargs="+", default=[1, 1, 2])
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("run", help="enhance a folder from a .wmx artifact")
    p.add_argument("-a", "--artifact", required=True)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", default="results/served")
    p.add_argument("--tiled", action="store_true",
                   help="use the artifact's tile program (frames larger "
                        "than every whole-frame bucket)")
    p.add_argument("--compile_cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory: the "
                        "first process pays each program's compile, every "
                        "later process loads the binary from DIR (the 4K "
                        "bucket compile is ~163 s — see BENCH_NOTES.md)")
    p.set_defaults(fn=cmd_run)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
