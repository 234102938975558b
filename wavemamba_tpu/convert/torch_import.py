"""Import reference PyTorch checkpoints into wavemamba_tpu param pytrees.

The released checkpoints (`ckpt/WaveMamba_*.pth`) store weights under key
``'params'`` (`inference_wavemamba.py:77`); `save_network` writes the same
structure (`basicsr/models/base_model.py:214-261`). This module maps that
flat ``name -> tensor`` dict onto our nested NHWC pytree:

  * conv weights OIHW -> HWIO, linear weights (out,in) -> (in,out)
  * LayerNorm/LayerNorm2d weight/bias -> g/b
  * SS2D stacked params: A_logs (4D, N) -> (4, D, N); Ds (4D,) -> (4, D);
    x_proj_weight/dt_projs_weight/bias keep their stacked layouts
  * torch Sequential indices are resolved to semantic names
    (ps_downX.1 -> ps_downX, conv_du.0/.1 -> conv/prelu, project_out.2 -> [1])

Works from numpy arrays — torch is only needed by `load_pth` to deserialize.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_NORM_PARENTS = {"ln_1", "ln_2", "out_norm", "norm1", "norm2", "LayerNorm"}
_LIST_CONTAINERS = {"l_blk", "h_blk", "fcs", "project_in", "project_out", "feats"}


def load_pth(path: str, param_key: str = "params") -> dict:
    """Deserialize a .pth into {name: np.ndarray} (falls back params_ema->params
    like `base_model.py:298-324` / `misc.py:163-168`)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for key in (param_key, "params_ema", "params", "state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):  # DDP prefix strip (`base_model.py:310-314`)
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def _map_key_and_value(tokens: list[str], v: np.ndarray):
    """Map one torch state-dict entry to (pytree path tokens, converted array)."""
    t = list(tokens)
    leaf = t[-1]

    # --- SS2D stacked parameters -----------------------------------------
    if leaf == "x_proj_weight":
        return t[:-1] + ["x_proj_w"], v  # (K, r+2n, d)
    if leaf == "dt_projs_weight":
        return t[:-1] + ["dt_projs_w"], v  # (K, d, r)
    if leaf == "dt_projs_bias":
        return t[:-1] + ["dt_projs_b"], v  # (K, d)
    if leaf == "A_logs":
        kd, n = v.shape
        return t, v.reshape(4, kd // 4, n)
    if leaf == "Ds":
        return t, v.reshape(4, -1)
    if leaf in ("skip_scale", "skip_scale2"):
        return t, v
    if leaf == "temperature":
        return t, v.reshape(-1)  # (heads,1,1) -> (heads,)

    # --- Sequential index fixups ------------------------------------------
    if len(t) >= 3 and t[-3].startswith("ps_down") and t[-2] == "1":
        t = t[:-2] + [leaf]  # ps_downX.1.weight -> ps_downX.weight
    elif "conv_du" in t:
        i = t.index("conv_du")
        if t[i + 1] == "0":
            t = t[: i + 1] + ["conv"] + t[i + 2 :]
        elif t[i + 1] == "1":
            return t[: i + 1] + ["prelu", "a"], v  # PReLU slope
    elif "project_out" in t and t[t.index("project_out") + 1] == "2":
        i = t.index("project_out")
        t = t[: i + 1] + ["1"] + t[i + 2 :]  # skip GELU at Sequential idx 1

    # --- Generic weight/bias ----------------------------------------------
    if leaf == "weight":
        parent = t[-2] if len(t) >= 2 else ""
        if parent in _NORM_PARENTS:
            return t[:-1] + ["g"], v
        if v.ndim == 4:  # conv OIHW -> HWIO
            return t[:-1] + ["w"], np.transpose(v, (2, 3, 1, 0))
        if v.ndim == 2:  # linear (out,in) -> (in,out)
            return t[:-1] + ["w"], np.transpose(v)
        # 1-D weight on a non-norm parent: LayerNorm2d stored flat
        return t[:-1] + ["g"], v
    if leaf == "bias":
        return t[:-1] + ["b"], v
    raise ValueError(f"unrecognized parameter {'.'.join(tokens)} with shape {v.shape}")


def _insert(tree: dict, path: list[str], value):
    node = tree
    for tok in path[:-1]:
        node = node.setdefault(tok, {})
    node[path[-1]] = value


def _listify(node):
    """Convert {'0': ..., '1': ...} children of known list containers."""
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        v = _listify(v)
        if k in _LIST_CONTAINERS and isinstance(v, dict) and all(s.isdigit() for s in v):
            idx = sorted(v, key=int)
            assert idx == [str(i) for i in range(len(idx))], f"gaps in {k}: {idx}"
            v = [v[i] for i in idx]
        out[k] = v
    return out


def convert_state_dict(state: dict, dtype=jnp.float32) -> dict:
    """{torch name: np.ndarray} -> nested wavemamba_tpu param pytree."""
    tree: dict = {}
    for name, v in state.items():
        path, arr = _map_key_and_value(name.split("."), np.asarray(v))
        _insert(tree, path, jnp.asarray(arr, dtype))
    return _listify(tree)


def load_wavemamba_checkpoint(path: str, dtype=jnp.float32) -> dict:
    return convert_state_dict(load_pth(path), dtype)
