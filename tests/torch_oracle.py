"""Load the *reference* PyTorch WaveMamba as a numerical test oracle.

The reference repo is mounted read-only at /root/reference. Its arch module
imports CUDA-only / absent packages (mamba_ssm, timm) and the basicsr
registry; we stub those with minimal CPU equivalents written here, then load
`wavemamba_arch.py` by file path. Nothing from the reference is copied into
the framework — this module exists purely so tests can compare outputs.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import torch
import torch.nn.functional as F

REFERENCE_ARCH = "/root/reference/basicsr/archs/wavemamba_arch.py"


def reference_available() -> bool:
    return os.path.exists(REFERENCE_ARCH)


def selective_scan_torch(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                         delta_softplus=False, return_last_state=False):
    """CPU oracle with mamba_ssm `selective_scan_fn` semantics.

    u, delta: (b, KD, L); A: (KD, N); B, C: (b, K, N, L); D: (KD,).
    """
    b, kd, L = u.shape
    n = A.shape[1]
    k = B.shape[1]
    d = kd // k
    u = u.float()
    delta = delta.float()
    if delta_bias is not None:
        delta = delta + delta_bias.float().view(1, -1, 1)
    if delta_softplus:
        delta = F.softplus(delta)
    # Expand group-shared B, C to per-channel: (b, KD, N, L)
    Bx = B.float().unsqueeze(2).expand(b, k, d, n, L).reshape(b, kd, n, L)
    Cx = C.float().unsqueeze(2).expand(b, k, d, n, L).reshape(b, kd, n, L)
    h = torch.zeros(b, kd, n)
    ys = []
    for t in range(L):
        a = torch.exp(delta[:, :, t, None] * A[None])  # (b, KD, N)
        h = a * h + delta[:, :, t, None] * Bx[:, :, :, t] * u[:, :, t, None]
        ys.append((h * Cx[:, :, :, t]).sum(-1))
    y = torch.stack(ys, dim=-1)  # (b, KD, L)
    if D is not None:
        y = y + D.float().view(1, -1, 1) * u
    if return_last_state:
        return y, h
    return y


def _install_stubs():
    if "mamba_ssm.ops.selective_scan_interface" in sys.modules:
        return
    mamba = types.ModuleType("mamba_ssm")
    ops = types.ModuleType("mamba_ssm.ops")
    iface = types.ModuleType("mamba_ssm.ops.selective_scan_interface")
    iface.selective_scan_fn = selective_scan_torch
    iface.selective_scan_ref = selective_scan_torch
    mamba.ops = ops
    ops.selective_scan_interface = iface
    sys.modules["mamba_ssm"] = mamba
    sys.modules["mamba_ssm.ops"] = ops
    sys.modules["mamba_ssm.ops.selective_scan_interface"] = iface

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval / drop_prob=0 => identity
            return x

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    timm_layers.trunc_normal_ = lambda t, *a, **k: t
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers

    basicsr = types.ModuleType("basicsr")
    basicsr_utils = types.ModuleType("basicsr.utils")
    basicsr_registry = types.ModuleType("basicsr.utils.registry")

    class _Registry:
        def register(self, *a, **k):
            def deco(cls):
                return cls

            return deco

    basicsr_registry.ARCH_REGISTRY = _Registry()
    basicsr.utils = basicsr_utils
    basicsr_utils.registry = basicsr_registry
    sys.modules["basicsr"] = basicsr
    sys.modules["basicsr.utils"] = basicsr_utils
    sys.modules["basicsr.utils.registry"] = basicsr_registry


_MODULES: dict = {}


def load_reference_module(path: str):
    """Import a reference module by path with stubbed deps (cached)."""
    if path not in _MODULES:
        _install_stubs()
        name = "ref_" + os.path.splitext(os.path.basename(path))[0]
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _MODULES[path] = mod
    return _MODULES[path]


def load_reference_arch():
    """Import /root/reference wavemamba_arch.py with stubbed deps (cached)."""
    return load_reference_module(REFERENCE_ARCH)
