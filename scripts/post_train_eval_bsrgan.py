"""Post-training for run 005 (BSRGAN-hardened procedural LLIE), CPU-only:
export best params to .pth, verify cross-framework (reference loads
strict=True, forwards match), save before/after samples, report val PSNR.
Run: PYTHONPATH= JAX_PLATFORMS=cpu python /tmp/post_bsrgan_eval.py
"""
import sys, glob, re
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import numpy as np
import torch

EXP = "/root/repo/experiments/005_WaveMamba_ProcLLIE_BSRGAN"

# 1) val PSNR trajectory from the train log
log = sorted(glob.glob(f"{EXP}/train_*.log"))[-1]
vals = re.findall(r"iter\s+([\d,]+)?.*?psnr: ([\d.]+)", open(log).read())
for line in open(log):
    if "psnr" in line and "Validation" not in line:
        print(line.strip()[-120:])

# 2) export best
from wavemamba_tpu.train.checkpoint import load_network
from wavemamba_tpu.convert.torch_export import params_to_state_dict

params = load_network(f"{EXP}/models/net_g_best_latest")
sd = {k: torch.from_numpy(np.asarray(v)) for k, v in params_to_state_dict(params).items()}
out = "/root/repo/ckpt/WaveMamba_ProcLLIE_BSRGAN.pth"
torch.save({"params": sd}, out)
print("exported", out)

# 3) reference loads strict=True + forward parity (CPU f32)
import torch_oracle as oracle
ref = oracle.load_reference_arch()
tm = ref.WaveMamba(in_chn=3, wf=32, n_l_blocks=[1, 2, 4], n_h_blocks=[1, 1, 2],
                   ffn_scale=2.0).eval()
missing = tm.load_state_dict(sd, strict=True)
print("reference strict load ok", missing)

import jax, jax.numpy as jnp
from wavemamba_tpu.models.wavemamba import WaveMambaConfig, wavemamba_apply
import cv2
cfg = WaveMambaConfig()
val_in = sorted(glob.glob("/root/repo/datasets/proc_llie_bsrgan/val/input/*.png"))[:2]
val_gt = sorted(glob.glob("/root/repo/datasets/proc_llie_bsrgan/val/gt/*.png"))[:2]
for i, (pi, pg) in enumerate(zip(val_in, val_gt)):
    img = cv2.imread(pi)[:, :, ::-1].astype(np.float32) / 255.0
    x = jnp.asarray(img[None])
    y = np.asarray(jax.jit(lambda p, x: wavemamba_apply(p, cfg, x))(params, x))[0]
    with torch.no_grad():
        t = tm(torch.from_numpy(np.transpose(img[None], (0, 3, 1, 2)).copy())).numpy()[0]
    d = np.abs(y - np.transpose(t, (1, 2, 0))).max()
    gt = cv2.imread(pg)[:, :, ::-1].astype(np.float32) / 255.0
    mse_in = np.mean((img - gt) ** 2); mse_out = np.mean((np.clip(y,0,1) - gt) ** 2)
    print(f"img{i}: cross-framework max|d|={d:.2e}  "
          f"PSNR in={10*np.log10(1/mse_in):.2f} -> out={10*np.log10(1/mse_out):.2f} dB")
    cv2.imwrite(f"/root/repo/ckpt/samples/bsrgan_{i:02d}_input.png",
                (img[:, :, ::-1] * 255).round().astype(np.uint8))
    cv2.imwrite(f"/root/repo/ckpt/samples/bsrgan_{i:02d}_restored.png",
                (np.clip(y,0,1)[:, :, ::-1] * 255).round().astype(np.uint8))
print("DONE")
