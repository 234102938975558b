"""VERDICT r2 #7: tiled-vs-whole fidelity of a REAL trained checkpoint on
the real chip. Loads ckpt/WaveMamba_ProcLLIE_512.pth, builds a 1080p
low-light frame from val images, runs whole-frame fast() inference vs
tiled_apply (tile 240/pad 16 — the reference's seam contract,
wavemamba_arch.py:1091-1151), reports PSNR between the two outputs."""
import sys, time, glob
sys.path.insert(0, "/root/repo")
import numpy as np
import cv2
import jax
import jax.numpy as jnp

from wavemamba_tpu.models.wavemamba import WaveMambaConfig, wavemamba_apply, pad_to_multiple
from wavemamba_tpu.train.checkpoint import load_network
from wavemamba_tpu.models.tiling import tiled_apply

print("devices:", jax.devices(), flush=True)

cfg = WaveMambaConfig.fast()
params = load_network("/root/repo/ckpt/WaveMamba_ProcLLIE_512.pth")

paths = sorted(glob.glob("/root/repo/datasets/proc_llie/val/input/*.png"))
imgs = [cv2.imread(p)[:, :, ::-1].astype(np.float32) / 255.0 for p in paths]
rows = []
for r in range(3):
    row = np.concatenate([imgs[(r * 4 + c) % len(imgs)] for c in range(4)], axis=1)
    rows.append(row)
mosaic = np.concatenate(rows, axis=0)[:1080, :1920]
x = np.ascontiguousarray(mosaic[None])

def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))

jit_fwd = jax.jit(lambda t: wavemamba_apply(params, cfg, t))

H, W = x.shape[1:3]
xp, h, w = pad_to_multiple(jnp.asarray(x), 8)
t0 = time.time()
whole = np.asarray(jit_fwd(xp))[:, :H, :W]
print(f"1080p whole compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
tiled = tiled_apply(jit_fwd, x, tile_size=240, tile_pad=16,
                    pad_multiple=8, tile_batch=8)
print(f"1080p tiled compile+run {time.time()-t0:.1f}s", flush=True)
p = psnr(whole, tiled)
print(f"1080p tiled-vs-whole PSNR {p:.2f} dB "
      f"(max|d| {float(np.max(np.abs(whole - tiled))):.5f})", flush=True)
print(f"  input mean {x.mean():.3f} -> whole {whole.mean():.3f} "
      f"tiled {tiled.mean():.3f}", flush=True)
