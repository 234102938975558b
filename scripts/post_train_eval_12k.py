"""Post-training for run 006 (12k-iter BSRGAN XL), CPU-only: export best
params to .pth, verify cross-framework (the reference loads strict=True and
the forwards match), save before/after samples, and cross-validate against
runs 004/005 on both val distributions.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/post_train_eval_12k.py
"""
import sys, glob, os, re
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import numpy as np
import torch
import cv2

EXP = "/root/repo/experiments/006_WaveMamba_ProcLLIE_BSRGAN_12k"

# 1) val trajectory from the train log
logs = sorted(glob.glob(f"{EXP}/train_*.log"))
for line in open(logs[-1]):
    if "psnr" in line:
        print(line.strip()[-120:])

# 2) export best
from wavemamba_tpu.train.checkpoint import load_network
from wavemamba_tpu.convert.torch_export import params_to_state_dict

params = load_network(f"{EXP}/models/net_g_best_latest")
sd = {k: torch.from_numpy(np.asarray(v)) for k, v in params_to_state_dict(params).items()}
out = "/root/repo/ckpt/WaveMamba_ProcLLIE_BSRGAN_12k.pth"
torch.save({"params": sd}, out)
print("exported", out)

# 3) reference strict load + forward parity (CPU f32)
import torch_oracle as oracle
ref = oracle.load_reference_arch()
tm = ref.WaveMamba(in_chn=3, wf=32, n_l_blocks=[1, 2, 4], n_h_blocks=[1, 1, 2],
                   ffn_scale=2.0).eval()
tm.load_state_dict(sd, strict=True)
print("reference strict load ok")

import jax, jax.numpy as jnp
from wavemamba_tpu.models.wavemamba import WaveMambaConfig, wavemamba_apply
cfg = WaveMambaConfig()
fwd = jax.jit(lambda p, x: wavemamba_apply(p, cfg, x))
os.makedirs("/root/repo/ckpt/samples", exist_ok=True)
val_in = sorted(glob.glob("/root/repo/datasets/proc_llie_bsrgan_xl/val/input/*.png"))[:2]
val_gt = sorted(glob.glob("/root/repo/datasets/proc_llie_bsrgan_xl/val/gt/*.png"))[:2]
for i, (pi, pg) in enumerate(zip(val_in, val_gt)):
    img = cv2.imread(pi)[:, :, ::-1].astype(np.float32) / 255.0
    y = np.asarray(fwd(params, jnp.asarray(img[None])))[0]
    with torch.no_grad():
        t = tm(torch.from_numpy(np.transpose(img[None], (0, 3, 1, 2)).copy())).numpy()[0]
    d = np.abs(y - np.transpose(t, (1, 2, 0))).max()
    gt = cv2.imread(pg)[:, :, ::-1].astype(np.float32) / 255.0
    mse_in = np.mean((img - gt) ** 2); mse_out = np.mean((np.clip(y, 0, 1) - gt) ** 2)
    print(f"img{i}: cross-framework max|d|={d:.2e}  "
          f"PSNR in={10*np.log10(1/mse_in):.2f} -> out={10*np.log10(1/mse_out):.2f} dB")
    cv2.imwrite(f"/root/repo/ckpt/samples/bsrgan12k_{i:02d}_input.png",
                (img[:, :, ::-1] * 255).round().astype(np.uint8))
    cv2.imwrite(f"/root/repo/ckpt/samples/bsrgan12k_{i:02d}_restored.png",
                (np.clip(y, 0, 1)[:, :, ::-1] * 255).round().astype(np.uint8))

# 4) cross-val vs prior checkpoints on both val distributions
sys.argv = ["cross_val_ckpts.py"]
import importlib.util
spec = importlib.util.spec_from_file_location(
    "cross_val", "/root/repo/scripts/cross_val_ckpts.py")
print("run scripts/cross_val_ckpts.py separately for the 004/005/006 table")
print("DONE")
