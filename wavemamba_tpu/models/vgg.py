"""VGG19 feature extractor for perceptual loss
(`basicsr/archs/vgg_arch.py:54-161`).

NHWC JAX implementation of the torchvision VGG19 `features` trunk with
named taps (conv1_1 ... conv5_4 / reluX_Y / poolX). Pretrained weights load
from a torchvision state-dict `.pth` via `load_vgg19_params` (zero-egress
environments must provide the file; `init_vgg19_params` gives random init
for tests).

Input convention matches the reference: RGB in [0, 1] (or [-1, 1] with
`range_norm`), ImageNet mean/std normalization (`vgg_arch.py:100-113`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# VGG19 configuration: channels per conv layer, 'M' = maxpool.
_VGG19 = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
          512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def layer_names():
    """Ordered tap names: conv/relu per conv, poolN after each block."""
    names = []
    block, conv = 1, 1
    for v in _VGG19:
        if v == "M":
            names.append(f"pool{block}")
            block += 1
            conv = 1
        else:
            names.append(f"conv{block}_{conv}")
            names.append(f"relu{block}_{conv}")
            conv += 1
    return names


def init_vgg19_params(key):
    params = []
    cin = 3
    for v in _VGG19:
        if v == "M":
            continue
        key, k = jax.random.split(key)
        params.append(
            {
                "w": jax.random.normal(k, (3, 3, cin, v), jnp.float32) * 0.02,
                "b": jnp.zeros((v,), jnp.float32),
            }
        )
        cin = v
    return params


def load_vgg19_params(path: str):
    """torchvision vgg19 state dict (features.N.weight OIHW) -> param list."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    params = []
    idx = 0
    for v in _VGG19:
        if v == "M":
            idx += 1  # pool layer
            continue
        w = sd[f"features.{idx}.weight"].numpy()
        b = sd[f"features.{idx}.bias"].numpy()
        params.append({"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)})
        idx += 2  # conv + relu
    return params


def vgg19_features(params, x, layer_name_list, use_input_norm=True, range_norm=False):
    """x: NHWC RGB. Returns {name: feature} for requested taps."""
    if range_norm:
        x = (x + 1.0) / 2.0
    if use_input_norm:
        x = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
    wanted = set(layer_name_list)
    out = {}
    names = layer_names()
    ni = 0
    pi = 0
    for v in _VGG19:
        if v == "M":
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            if names[ni] in wanted:
                out[names[ni]] = x
            ni += 1
        else:
            conv = params[pi]
            dn = lax.conv_dimension_numbers(x.shape, conv["w"].shape, ("NHWC", "HWIO", "NHWC"))
            x = lax.conv_general_dilated(
                x, conv["w"], (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
            ) + conv["b"]
            if names[ni] in wanted:
                out[names[ni]] = x
            ni += 1
            x = jax.nn.relu(x)
            if names[ni] in wanted:
                out[names[ni]] = x
            ni += 1
            pi += 1
        if len(out) == len(wanted):
            break
    return out


def perceptual_loss(vgg_params, pred, target, layer_weights, criterion="l1",
                    perceptual_weight=1.0, style_weight=0.0,
                    use_input_norm=True, range_norm=False):
    """Perceptual + optional style (Gram) loss (`losses/losses.py:190-297`)."""
    names = list(layer_weights.keys())
    fx = vgg19_features(vgg_params, pred, names, use_input_norm, range_norm)
    fy = vgg19_features(vgg_params, jax.lax.stop_gradient(target), names,
                        use_input_norm, range_norm)

    def crit(a, b):
        if criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if criterion == "l2" or criterion == "mse":
            return jnp.mean((a - b) ** 2)
        if criterion == "fro":
            return jnp.linalg.norm(a - b)
        raise NotImplementedError(criterion)

    def gram(f):
        b, h, w, c = f.shape
        m = f.reshape(b, h * w, c)
        return jnp.einsum("blc,bld->bcd", m, m, precision="highest") / (c * h * w)

    percep = 0.0
    style = 0.0
    for name, wgt in layer_weights.items():
        percep = percep + crit(fx[name], fy[name]) * wgt
        if style_weight > 0:
            style = style + crit(gram(fx[name]), gram(fy[name])) * wgt
    out_p = percep * perceptual_weight if perceptual_weight > 0 else None
    out_s = style * style_weight if style_weight > 0 else None
    return out_p, out_s
