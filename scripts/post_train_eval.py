"""Post-training pipeline (CPU-only), parameterized over the run.

For a finished experiment: print the val trajectory from the train log,
export the best params to a reference-format ``.pth``, verify the
checkpoint cross-framework (the reference arch at /root/reference loads
it strict=True and its forward matches ours), and save before/after val
samples. Follow with ``scripts/cross_val_ckpts.py`` for the
cross-checkpoint table on every val distribution.

Supersedes the run-005/006 hardcoded variants (this is the same flow
they ran, BENCH_NOTES.md "run 005"/"run 006").

Usage:
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/post_train_eval.py \
        --exp experiments/007_WaveMamba_ProcLLIE_BSRGAN_15k \
        --out ckpt/WaveMamba_ProcLLIE_BSRGAN_15k.pth \
        --val datasets/proc_llie_bsrgan_xl/val --prefix bsrgan15k
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import cv2
import numpy as np
import torch


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True, help="experiment dir")
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--val", required=True,
                    help="val dir holding input/ and gt/ subfolders")
    ap.add_argument("--prefix", default="run",
                    help="ckpt/samples/<prefix>_NN_{input,restored}.png")
    ap.add_argument("--model", default="net_g_best_latest",
                    help="which models/ entry to export")
    ap.add_argument("--n-samples", type=int, default=2)
    ap.add_argument("--wf", type=int, default=32)
    ap.add_argument("--n_l_blocks", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--n_h_blocks", type=int, nargs="+", default=[1, 1, 2])
    args = ap.parse_args(argv)

    # 1) val trajectory from the train log
    logs = sorted(glob.glob(os.path.join(args.exp, "train_*.log")))
    if logs:
        for line in open(logs[-1]):
            if "psnr" in line:
                print(line.strip()[-120:])

    # 2) export the chosen snapshot to reference-format .pth
    from wavemamba_tpu.convert.torch_export import params_to_state_dict
    from wavemamba_tpu.train.checkpoint import load_network

    params = load_network(os.path.join(args.exp, "models", args.model))
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_state_dict(params).items()}
    torch.save({"params": sd}, args.out)
    print("exported", args.out)

    # 3) reference strict load + forward parity (CPU f32)
    import torch_oracle as oracle

    ref = oracle.load_reference_arch()
    tm = ref.WaveMamba(in_chn=3, wf=args.wf, n_l_blocks=list(args.n_l_blocks),
                       n_h_blocks=list(args.n_h_blocks), ffn_scale=2.0).eval()
    tm.load_state_dict(sd, strict=True)
    print("reference strict load ok")

    import jax
    import jax.numpy as jnp

    from wavemamba_tpu.models.wavemamba import WaveMambaConfig, wavemamba_apply

    cfg = WaveMambaConfig(wf=args.wf, n_l_blocks=tuple(args.n_l_blocks),
                          n_h_blocks=tuple(args.n_h_blocks))
    fwd = jax.jit(lambda p, x: wavemamba_apply(p, cfg, x))
    os.makedirs("/root/repo/ckpt/samples", exist_ok=True)
    val_in = sorted(glob.glob(os.path.join(args.val, "input", "*.png")))
    val_gt = sorted(glob.glob(os.path.join(args.val, "gt", "*.png")))
    for i, (pi, pg) in enumerate(
            list(zip(val_in, val_gt))[: args.n_samples]):
        img = cv2.imread(pi)[:, :, ::-1].astype(np.float32) / 255.0
        y = np.asarray(fwd(params, jnp.asarray(img[None])))[0]
        with torch.no_grad():
            t = tm(torch.from_numpy(
                np.transpose(img[None], (0, 3, 1, 2)).copy())).numpy()[0]
        d = np.abs(y - np.transpose(t, (1, 2, 0))).max()
        gt = cv2.imread(pg)[:, :, ::-1].astype(np.float32) / 255.0
        mse_in = np.mean((img - gt) ** 2)
        mse_out = np.mean((np.clip(y, 0, 1) - gt) ** 2)
        print(f"img{i}: cross-framework max|d|={d:.2e}  "
              f"PSNR in={10*np.log10(1/mse_in):.2f} -> "
              f"out={10*np.log10(1/mse_out):.2f} dB")
        cv2.imwrite(f"/root/repo/ckpt/samples/{args.prefix}_{i:02d}_input.png",
                    (img[:, :, ::-1] * 255).round().astype(np.uint8))
        cv2.imwrite(
            f"/root/repo/ckpt/samples/{args.prefix}_{i:02d}_restored.png",
            (np.clip(y, 0, 1)[:, :, ::-1] * 255).round().astype(np.uint8))
    print("run scripts/cross_val_ckpts.py for the cross-checkpoint table")
    print("DONE")


if __name__ == "__main__":
    main()
