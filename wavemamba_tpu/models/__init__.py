"""Model factory. The reference resolves YAML `type:` strings through a
decorator registry (`basicsr/utils/registry.py`); here the registry is an
explicit static map — same extension point, no import-side effects."""

from wavemamba_tpu.models.wavemamba import (
    WaveMambaConfig,
    init_wavemamba,
    param_count,
    wavemamba_apply,
)

_ARCHS = {}


def register_arch(name):
    def deco(fn):
        _ARCHS[name] = fn
        return fn

    return deco


def build_network(opt: dict):
    """opt: dict with 'type' plus kwargs (mirrors `basicsr/archs/__init__.py:19`).

    Resolution order: built-in factories, then the user-extensible
    ARCH_REGISTRY (decorator registrations, `utils/registry.py`)."""
    opt = dict(opt)
    name = opt.pop("type")
    if name in _ARCHS:
        return _ARCHS[name](**opt)
    from wavemamba_tpu.utils.registry import ARCH_REGISTRY

    if name in ARCH_REGISTRY:
        return ARCH_REGISTRY.get(name)(**opt)
    raise KeyError(
        f"Unknown arch type {name!r}; known: {sorted(_ARCHS) + sorted(ARCH_REGISTRY.keys())}"
    )


@register_arch("WaveMamba")
def _build_wavemamba(**kw):
    known = {f.name for f in __import__("dataclasses").fields(WaveMambaConfig)}
    cfg = WaveMambaConfig(**{k: tuple(v) if isinstance(v, list) else v
                             for k, v in kw.items() if k in known})
    return cfg


@register_arch("ART")
def _build_art(**kw):
    from wavemamba_tpu.models.art import ARTConfig

    known = {f.name for f in __import__("dataclasses").fields(ARTConfig)}
    return ARTConfig(**{k: v for k, v in kw.items() if k in known})


def init_for(cfg):
    """Config object -> init function (keyed by config type). Custom archs
    can expose `init_fn(key, cfg) -> params` on the config object."""
    from wavemamba_tpu.models.art import ARTConfig, init_art

    if isinstance(cfg, WaveMambaConfig):
        return init_wavemamba
    if isinstance(cfg, ARTConfig):
        return init_art
    if hasattr(cfg, "init_fn"):
        return cfg.init_fn
    raise TypeError(f"no init for config type {type(cfg).__name__}")


def apply_for(cfg):
    """Config object -> apply function (params, cfg, x) -> y. Custom archs
    can expose `apply_fn(params, cfg, x)` on the config object; a
    two-output apply returning (out, out8) enables UHDModel training."""
    from wavemamba_tpu.models.art import ARTConfig, art_apply

    if isinstance(cfg, WaveMambaConfig):
        return wavemamba_apply
    if isinstance(cfg, ARTConfig):
        return art_apply
    if hasattr(cfg, "apply_fn"):
        return cfg.apply_fn
    raise TypeError(f"no apply for config type {type(cfg).__name__}")


__all__ = [
    "WaveMambaConfig",
    "init_wavemamba",
    "wavemamba_apply",
    "param_count",
    "build_network",
    "register_arch",
]
