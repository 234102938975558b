"""LPIPS (AlexNet backbone) in JAX.

The reference computes LPIPS with torchmetrics' AlexNet variant on [-1, 1]
inputs (`inference_wavemamba.py:16-18,118-119`) and pyiqa's lpips-vgg in the
validation loop. This module implements the AlexNet LPIPS graph natively
(NHWC, XLA) and loads the standard pretrained weights from a torch
state-dict file (torchvision AlexNet features + LPIPS linear heads).

Zero-egress environments ship no pretrained weights; `load_lpips_params`
raises a clear error if the file is absent. Tests exercise the graph with
random weights.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# AlexNet feature config: (out_ch, kernel, stride, pad) per conv; taps after
# each ReLU (5 stages, channels 64/192/384/256/256).
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool(3, stride 2) after stages 0 and 1 (and 4, unused)

# LPIPS input normalization (the 'scaling layer'): inputs in [-1, 1].
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(key):
    """Random-init params with the right shapes (testing / no-weights)."""
    params = {"convs": [], "lins": []}
    cin = 3
    for i, (cout, k, _, _) in enumerate(_ALEX_CONVS):
        key, k1 = jax.random.split(key)
        params["convs"].append(
            {
                "w": jax.random.normal(k1, (k, k, cin, cout), jnp.float32) * 0.05,
                "b": jnp.zeros((cout,), jnp.float32),
            }
        )
        params["lins"].append(jnp.abs(jax.random.normal(key, (cout,), jnp.float32)) * 0.1)
        cin = cout
    return params


def load_lpips_params(path):
    """Load AlexNet-LPIPS weights from a torch state-dict (.pth).

    Accepts every layout the standard packages actually save
    (`inference_wavemamba.py:16-18` uses torchmetrics' AlexNet variant):
      * torchvision AlexNet style: ``features.{0,3,6,8,10}.weight/bias``
        (with or without a leading ``net.``) + ``lin{i}.model.1.weight``
      * `lpips` package (richzhang/PerceptualSimilarity)
        ``LPIPS(net='alex').state_dict()``: ``net.slice{s}.{fi}.weight``
        (slices keep the original torchvision indices) +
        ``lin{i}.model.1.weight`` + ``scaling_layer.shift/scale``
      * torchmetrics ``LearnedPerceptualImagePatchSimilarity``: the lpips
        layout with one more ``net.`` prefix on every key
    If the file carries ``scaling_layer.shift/scale`` they override the
    built-in constants (they are the same values in the released weights).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    if any(k.startswith("net.net.slice") or k.startswith("net.lin0.") for k in sd):
        # torchmetrics wraps the whole lpips module under one more 'net.'
        sd = {k[len("net."):]: v for k, v in sd.items() if k.startswith("net.")}
    convs, lins = [], []
    feat_idx = [0, 3, 6, 8, 10]  # torchvision AlexNet features conv indices
    for i, fi in enumerate(feat_idx):
        w = None
        for key in (
            f"net.features.{fi}.weight",
            f"features.{fi}.weight",
            f"net.slice{i + 1}.{fi}.weight",
        ):
            if key in sd:
                w = sd[key].numpy()
                b = sd[key.replace("weight", "bias")].numpy()
        if w is None:
            raise KeyError(f"AlexNet conv {fi} not found in {path}")
        convs.append({"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)})
        lw = None
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                lw = sd[key].numpy().reshape(-1)
        if lw is None:
            raise KeyError(f"LPIPS linear head {i} not found in {path}")
        lins.append(jnp.asarray(lw))
    params = {"convs": convs, "lins": lins}
    if "scaling_layer.shift" in sd:
        params["shift"] = jnp.asarray(sd["scaling_layer.shift"].numpy().reshape(-1))
        params["scale"] = jnp.asarray(sd["scaling_layer.scale"].numpy().reshape(-1))
    return params


def _features(params, x):
    """x: NHWC in [-1, 1] -> list of 5 feature maps."""
    shift = params.get("shift", jnp.asarray(_SHIFT))
    scale = params.get("scale", jnp.asarray(_SCALE))
    x = (x - shift) / scale
    feats = []
    for i, ((cout, k, stride, pad), conv) in enumerate(zip(_ALEX_CONVS, params["convs"])):
        dn = lax.conv_dimension_numbers(x.shape, conv["w"].shape, ("NHWC", "HWIO", "NHWC"))
        x = lax.conv_general_dilated(
            x, conv["w"], (stride, stride), [(pad, pad), (pad, pad)], dimension_numbers=dn
        ) + conv["b"]
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips(params, x, y):
    """LPIPS distance between NHWC images in [-1, 1]. Returns (B,) array."""
    fx = _features(params, x)
    fy = _features(params, y)
    total = 0.0
    for f1, f2, lin in zip(fx, fy, params["lins"]):
        n1 = f1 / jnp.sqrt(jnp.sum(f1**2, axis=-1, keepdims=True) + 1e-10)
        n2 = f2 / jnp.sqrt(jnp.sum(f2**2, axis=-1, keepdims=True) + 1e-10)
        d = (n1 - n2) ** 2
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total
