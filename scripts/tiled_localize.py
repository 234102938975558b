"""Localize tiled-vs-whole error: seam artifact or global-receptive-field
property? CPU f32 (bit-parity config), trained ProcLLIE_512 checkpoint,
256^2 crop. If the error is ~uniform over tile interiors (not concentrated
in seam bands), the 29 dB @1080p is the model's global scan state differing
per tile, not a stitching bug."""
import sys, glob
sys.path.insert(0, "/root/repo")
import numpy as np
import cv2
import jax, jax.numpy as jnp

from wavemamba_tpu.models.wavemamba import WaveMambaConfig, wavemamba_apply
from wavemamba_tpu.train.checkpoint import load_network
from wavemamba_tpu.models.tiling import tiled_apply

cfg = WaveMambaConfig()  # f32 bit-parity: isolates tiling from bf16 noise
params = load_network("/root/repo/ckpt/WaveMamba_ProcLLIE_512.pth")

p = sorted(glob.glob("/root/repo/datasets/proc_llie/val/input/*.png"))[0]
img = cv2.imread(p)[:, :, ::-1].astype(np.float32) / 255.0
x = np.ascontiguousarray(img[None, :256, :256])

jit_fwd = jax.jit(lambda t: wavemamba_apply(params, cfg, t))
whole = np.asarray(jit_fwd(jnp.asarray(x)))

def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))

for ts in (64, 128):
    tiled = tiled_apply(jit_fwd, x, tile_size=ts, tile_pad=16,
                        pad_multiple=8, tile_batch=4)
    err = np.abs(whole - tiled)[0].mean(-1)  # (H, W)
    # seam band: within 4 px of an interior tile boundary
    seam = np.zeros((256, 256), bool)
    for b in range(ts, 256, ts):
        seam[max(0, b - 4) : b + 4, :] = True
        seam[:, max(0, b - 4) : b + 4] = True
    print(f"tile={ts}: PSNR {psnr(whole, tiled):.2f} dB  "
          f"mean|d| seam-band {err[seam].mean():.5f} vs interior "
          f"{err[~seam].mean():.5f}  (ratio {err[seam].mean()/err[~seam].mean():.2f})",
          flush=True)
print("DONE")
