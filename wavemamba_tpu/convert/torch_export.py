"""Export wavemamba_tpu param pytrees back to reference-format state dicts —
the exact inverse of `torch_import.py` (layouts, Sequential indices, stacked
SS2D params). Lets checkpoints trained here round-trip into the PyTorch
implementation and its tooling."""

from __future__ import annotations

import numpy as np


def _emit(out: dict, prefix: list[str], tree):
    if isinstance(tree, list):
        # list containers: l_blk/h_blk/fcs keep numeric names; the
        # FeedForward Sequentials map [0, 1] -> torch indices.
        name = prefix[-1] if prefix else ""
        for i, sub in enumerate(tree):
            if name == "project_out":
                idx = {0: "0", 1: "2"}[i]  # GELU occupies Sequential slot 1
            else:
                idx = str(i)
            _emit(out, prefix + [idx], sub)
        return
    if isinstance(tree, dict):
        for k, v in tree.items():
            _emit(out, prefix + [k], v)
        return

    v = np.asarray(tree)
    toks = list(prefix)
    leaf = toks[-1]
    parent = toks[-2] if len(toks) >= 2 else ""

    if leaf == "x_proj_w":
        out[".".join(toks[:-1] + ["x_proj_weight"])] = v
    elif leaf == "dt_projs_w":
        out[".".join(toks[:-1] + ["dt_projs_weight"])] = v
    elif leaf == "dt_projs_b":
        out[".".join(toks[:-1] + ["dt_projs_bias"])] = v
    elif leaf == "A_logs":
        out[".".join(toks)] = v.reshape(-1, v.shape[-1])
    elif leaf == "Ds":
        out[".".join(toks)] = v.reshape(-1)
    elif leaf == "temperature":
        out[".".join(toks)] = v.reshape(-1, 1, 1)
    elif leaf in ("skip_scale", "skip_scale2"):
        out[".".join(toks)] = v
    elif parent == "prelu" and leaf == "a":
        # conv_du.prelu.a -> conv_du.1.weight
        out[".".join(toks[:-2] + ["1", "weight"])] = v
    elif parent == "conv" and len(toks) >= 3 and toks[-3] == "conv_du":
        # conv_du.conv.{w} -> conv_du.0.{weight}
        name = {"w": "weight", "b": "bias"}[leaf]
        arr = np.transpose(v, (3, 2, 0, 1)) if leaf == "w" and v.ndim == 4 else v
        out[".".join(toks[:-2] + ["0", name])] = arr
    elif leaf == "w":
        base = toks[:-1]
        if base and base[-1].startswith("ps_down"):
            base = base + ["1"]  # Sequential: [PixelUnshuffle, Conv]
        if v.ndim == 4:
            out[".".join(base + ["weight"])] = np.transpose(v, (3, 2, 0, 1))
        else:
            out[".".join(base + ["weight"])] = np.transpose(v)
    elif leaf == "b":
        base = toks[:-1]
        if base and base[-1].startswith("ps_down"):
            base = base + ["1"]
        out[".".join(base + ["bias"])] = v
    elif leaf == "g":
        out[".".join(toks[:-1] + ["weight"])] = v
    else:
        raise ValueError(f"unrecognized leaf {'.'.join(toks)} shape {v.shape}")


def params_to_state_dict(params: dict) -> dict:
    out: dict = {}
    _emit(out, [], params)
    return out
