"""Cross-checkpoint validation table: every trained checkpoint on every
val distribution (proc_llie = clean low-light, proc_llie_bsrgan =
composite degradations, proc_llie_bsrgan_xl = run-006/007 held-out set).
CPU f32. Checkpoints that don't exist on disk are skipped."""
import sys, glob
sys.path.insert(0, "/root/repo")
import numpy as np, cv2, jax, jax.numpy as jnp
from wavemamba_tpu.models.wavemamba import WaveMambaConfig, wavemamba_apply
from wavemamba_tpu.train.checkpoint import load_network

cfg = WaveMambaConfig()
_CKPTS = {
    "004": "/root/repo/ckpt/WaveMamba_ProcLLIE_512.pth",
    "005": "/root/repo/ckpt/WaveMamba_ProcLLIE_BSRGAN.pth",
    "006": "/root/repo/ckpt/WaveMamba_ProcLLIE_BSRGAN_12k.pth",
    "007": "/root/repo/ckpt/WaveMamba_ProcLLIE_BSRGAN_15k.pth",
    "008": "/root/repo/ckpt/WaveMamba_ProcLLIE_BSRGAN_XXL.pth",
    "009": "/root/repo/ckpt/WaveMamba_ProcLLIE_BSRGAN_6K4.pth",
    "010": "/root/repo/ckpt/WaveMamba_ProcLLIE_BSRGAN_XXL3.pth",
    "011": "/root/repo/ckpt/WaveMamba_ProcLLIE_BSRGAN_XXL4.pth",
}
import os
ck = {k: load_network(p) for k, p in _CKPTS.items() if os.path.exists(p)}
fwd = jax.jit(lambda p, t: wavemamba_apply(p, cfg, t))

def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))

for ds in ("proc_llie", "proc_llie_bsrgan", "proc_llie_bsrgan_xl"):
    ins = sorted(glob.glob(f"/root/repo/datasets/{ds}/val/input/*.png"))[:6]
    gts = sorted(glob.glob(f"/root/repo/datasets/{ds}/val/gt/*.png"))[:6]
    for name, params in ck.items():
        vals = []
        for pi, pg in zip(ins, gts):
            x = cv2.imread(pi)[:, :, ::-1].astype(np.float32) / 255.0
            g = cv2.imread(pg)[:, :, ::-1].astype(np.float32) / 255.0
            y = np.clip(np.asarray(fwd(params, jnp.asarray(x[None])))[0], 0, 1)
            vals.append(psnr(y, g))
        print(f"{ds:18s} ckpt {name}: PSNR {np.mean(vals):.2f} dB (n={len(vals)})",
              flush=True)
print("DONE")
