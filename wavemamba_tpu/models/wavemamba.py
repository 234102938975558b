"""WaveMamba — wavelet state-space U-Net for UHD low-light enhancement.

TPU-native functional re-design of the reference architecture
(`basicsr/archs/wavemamba_arch.py`). Everything is NHWC, pure functions over
explicit parameter pytrees whose nesting mirrors the reference module tree
(so the `.pth` converter is a mechanical name/layout map).

Components and their reference counterparts (path:line into /root/reference):
  * SS2D 2-D selective scan      wavemamba_arch.py:316-497
  * LFSSBlock                    wavemamba_arch.py:499-528
  * ffn (NAFNet SimpleGate FFN)  wavemamba_arch.py:214-231
  * LayerNorm2d                  wavemamba_arch.py:532-569 (channel LN)
  * Matching / PAConv / CMT      wavemamba_arch.py:608-798
  * FeedForward (+Restormer)     wavemamba_arch.py:721-751, 801-819
  * HFEBlock                     wavemamba_arch.py:822-854
  * SKFF                         wavemamba_arch.py:923-959
  * DownFRG / upFRG              wavemamba_arch.py:962-1008
  * UNet / WaveMamba             wavemamba_arch.py:1011-1176
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from wavemamba_tpu.ops.haar import dwt2, dwt2_conv, iwt2_cat
from wavemamba_tpu.ops.nn import (
    dot_precision,
    conv2d,
    gelu,
    init_conv2d,
    init_layer_norm,
    init_linear,
    l2_normalize,
    layer_norm,
    linear,
    pixel_unshuffle,
    prelu,
    silu,
)
from wavemamba_tpu.ops.scan import selective_scan


@dataclasses.dataclass(frozen=True)
class WaveMambaConfig:
    """Shipped hyperparameters: `inference_wavemamba.py:71-75`."""

    in_chn: int = 3
    wf: int = 32
    n_l_blocks: Sequence[int] = (1, 2, 4)
    n_h_blocks: Sequence[int] = (1, 1, 2)
    ffn_scale: float = 2.0
    d_state: int = 16
    d_conv: int = 3
    ffn_restormer: bool = False
    # Execution knobs (not part of the checkpoint). Defaults are the
    # bit-parity float32 path; `WaveMambaConfig.fast()` is the tuned bf16
    # TPU inference preset (measured on v5e, see BENCH_NOTES.md).
    scan_impl: str = "chunked"  # 'par'|'chunked'|'ref'|'pallas'|'pallas_fused'|'seq_sharded'
    scan_chunk: int = 256
    scan_sub: int = 32
    scan_dtype: str = "float32"  # 'bfloat16' halves scan HBM traffic
    # For scan_impl='seq_sharded': the jax Mesh whose `scan_mesh_axis` the
    # token axis L is sharded over (beyond-single-chip-memory frames; see
    # parallel/seq_scan.py). All other impls ignore these.
    scan_mesh: object = None
    scan_mesh_axis: str = "data"
    # Rematerialize LFSS/HFE blocks under autodiff: the backward pass
    # recomputes block forwards instead of saving the scan's chunked
    # residuals (which otherwise exceed HBM at training shapes; a
    # batch-8 512^2 step saved ~38 GB without this). No effect on eval.
    remat: bool = True
    # 'save_scan' saves the fused scan kernel's outputs/residuals across the
    # block remat ('full' recomputes everything, the r2 behavior).
    remat_policy: str = "save_scan"
    # 'bfloat16' runs convs/matmuls in bf16 on the MXU (scan state stays
    # fp32); 'float32' is bit-parity mode.
    compute_dtype: str = "float32"
    # 'fused' collapses the model's multi-conv chains (LFSS ffn, qkv+dwconv,
    # PAConv, HFE FeedForward, SS2D dwconv, stray dense 3x3s) into single
    # Pallas kernels (ops/conv_fused.py) — the r2 finding is that XLA TPU
    # convs cost ~0.7-1 ms *per call* at 540p, so chain fusion removes pure
    # dispatch. Inference-only (no custom VJP); 'xla' is the differentiable
    # and bit-parity lowering.
    conv_impl: str = "xla"
    # Region tags whose 1x1 convs OPT OUT of the token-matmul lowering and
    # stay in XLA's conv layout ('ffn' = LFSS ffn chain, 'hfe' = CMT/FF/
    # PAConv chains). The matmul lowering is 13x faster per op, but a 1x1
    # between two depthwise convs drags token<->conv relayout copies; this
    # knob lets the sweep decide per region (bench scripts/tpu_1x1_sweep.py).
    conv1x1_as_conv: Sequence[str] = ()

    @classmethod
    def fast(cls, **kw):
        """Tuned TPU inference preset: bf16 convs/matmuls + the FUSED Pallas
        kernel (dt/B/C projections + scan in one kernel, fp32 state, bf16
        MXU reversal permutes + bf16 y streaming) + MXU-conv Haar/pyramid.
        0.201 s @1080p device-side on one v5e — ~2x the reference GPU's
        0.402 s (BENCH_NOTES.md). Also
        differentiable (`fast_train()` tunes the chunk for the backward
        kernel's VMEM budget). Mosaic kernels only compile on TPU backends,
        so on CPU/GPU this silently degrades to the portable `fast_xla()`
        preset instead of crashing."""
        import jax

        try:
            backend = jax.default_backend()
        except Exception:  # backend init failure — be conservative
            backend = "cpu"
        if backend in ("cpu", "gpu", "cuda", "rocm"):
            return cls.fast_xla(**kw)
        return cls.fast_tpu(**kw)

    @classmethod
    def fast_tpu(cls, **kw):
        """The TPU fast() preset WITHOUT the backend sniff: what `fast()`
        resolves to on a TPU backend. Use directly when building TPU
        artifacts on a CPU host (deploy.py AOT export with
        ``allow_custom_calls`` — Mosaic lowering is host-side)."""
        kw.setdefault("scan_impl", "pallas_fused")
        kw.setdefault("compute_dtype", "bfloat16")
        # y streamed bf16 (state math stays f32): identical fidelity to f32
        # streaming on-chip (54.7 vs 54.6 dB @512^2 — the post-scan
        # LayerNorm absorbs the rounding), ~5 ms faster @1080p (r3 bench).
        kw.setdefault("scan_dtype", "bfloat16")
        # chunk 512 fits the fused kernel's VMEM again since the bf16 MXU
        # permutes (r3) and measures faster than 256 at both kernel
        # (19.28 vs 19.89 ms @L=518k pairs) and model level. Training keeps
        # its own chunk via fast_train() (backward kernel budget).
        kw.setdefault("scan_chunk", 512)
        # conv_impl='fused' is available but NOT default: the chain kernels
        # measured ~1.5-2 ms/call SLOWER than XLA's conv path at 540p
        # (BENCH_NOTES r3) — flip once the kernel beats XLA.
        return cls(**kw)

    @classmethod
    def fast_train(cls, **kw):
        """Tuned TPU TRAINING preset: fused Pallas kernel with its fused
        backward (custom VJP, direction-uniform combined-lane kernel) +
        bf16 convs + block remat with the save_scan policy (saves the scan
        kernel's y/carries across the block remat, removing the duplicate
        scan forward from the backward pass: 0.798 -> 0.690 s/step) + bf16
        y streaming + the r4 h_prev elimination in the backward (one fewer
        (T, N, 2D) f32 VMEM array). 0.661 s/step batch 8 @512^2 on one
        v5e (12.1 img/s; r2 was 0.844, r3 0.675; loss parity 2e-6
        relative). chunk=128 measured fastest (192 now compiles and is
        within 0.4%; 256 still overflows the fused backward's ~16 MB
        scoped-VMEM budget — BENCH_NOTES r4 "training-step floor" has the
        live-array accounting)."""
        import jax

        try:
            backend = jax.default_backend()
        except Exception:
            backend = "cpu"
        if backend in ("cpu", "gpu", "cuda", "rocm"):
            return cls.fast_xla(**kw)
        kw.setdefault("scan_impl", "pallas_fused")
        kw.setdefault("scan_chunk", 128)
        kw.setdefault("compute_dtype", "bfloat16")
        kw.setdefault("scan_dtype", "bfloat16")
        return cls(**kw)

    @classmethod
    def fast_xla(cls, **kw):
        """Portable fast preset (no Pallas): bf16 + fully-parallel XLA scan
        with bf16 working arrays. 0.539 s @1080p on v5e."""
        kw.setdefault("scan_impl", "par")
        kw.setdefault("scan_sub", 32)
        kw.setdefault("compute_dtype", "bfloat16")
        kw.setdefault("scan_dtype", "bfloat16")
        return cls(**kw)

    @property
    def d_inner(self) -> int:
        return int(self.ffn_scale * self.wf)

    @property
    def dt_rank(self) -> int:
        return math.ceil(self.wf / 16)


# ---------------------------------------------------------------------------
# SS2D — 2-D selective scan (4 directional 1-D scans over the token grid).


def init_ss2d(key, cfg: WaveMambaConfig, dt_min=0.001, dt_max=0.1, dt_init_floor=1e-4):
    c, d, n, r = cfg.wf, cfg.d_inner, cfg.d_state, cfg.dt_rank
    keys = jax.random.split(key, 8)
    p = {}
    p["in_proj"] = init_linear(keys[0], c, 2 * d, bias=False)
    p["conv2d"] = init_conv2d(keys[1], cfg.d_conv, cfg.d_conv, d, d, groups=d, bias=True)
    # Stacked per-direction projections (K=4), torch layouts:
    #   x_proj_w (K, r+2n, d), dt_projs_w (K, d, r), dt_projs_b (K, d).
    std = 1.0 / math.sqrt(d)
    p["x_proj_w"] = jax.random.uniform(keys[2], (4, r + 2 * n, d), jnp.float32, -std, std)
    dt_std = r**-0.5
    p["dt_projs_w"] = jax.random.uniform(keys[3], (4, d, r), jnp.float32, -dt_std, dt_std)
    dt = jnp.exp(
        jax.random.uniform(keys[4], (4, d), jnp.float32)
        * (math.log(dt_max) - math.log(dt_min))
        + math.log(dt_min)
    )
    dt = jnp.maximum(dt, dt_init_floor)
    # Inverse softplus so softplus(bias) lands in [dt_min, dt_max].
    p["dt_projs_b"] = dt + jnp.log(-jnp.expm1(-dt))
    # S4D-real A: A_log[d, n] = log(n+1); stored (K, d, n).
    a_log = jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32))
    p["A_logs"] = jnp.broadcast_to(a_log[None, None, :], (4, d, n)).copy()
    p["Ds"] = jnp.ones((4, d), jnp.float32)
    p["out_norm"] = init_layer_norm(d)
    p["out_proj"] = init_linear(keys[5], d, c, bias=False)
    return p


def _scan_directions(x):
    """x: (B, H, W, D) -> xs (B, 4, L, D) in the reference's direction order
    (row-major, col-major, both reversed; `wavemamba_arch.py:451-452`)."""
    b, h, w, d = x.shape
    k0 = x.reshape(b, h * w, d)
    k1 = x.transpose(0, 2, 1, 3).reshape(b, h * w, d)
    return jnp.stack([k0, k1, k0[:, ::-1], k1[:, ::-1]], axis=1)


def _merge_directions(y, h, w):
    """y: (B, 4, L, D) scan outputs -> (B, H, W, D) sum of un-flipped dirs
    (`wavemamba_arch.py:474-478,490`)."""
    b, _, l, d = y.shape
    y0 = y[:, 0]
    y1 = y[:, 1].reshape(b, w, h, d).transpose(0, 2, 1, 3).reshape(b, l, d)
    y2 = y[:, 2, ::-1]
    y3 = y[:, 3, ::-1].reshape(b, w, h, d).transpose(0, 2, 1, 3).reshape(b, l, d)
    return (y0 + y1 + y2 + y3).reshape(b, h, w, d)


def ss2d_apply(p, cfg: WaveMambaConfig, x):
    """x: (B, H, W, C) -> (B, H, W, C). `wavemamba_arch.py:480-497`."""
    b, h, w, c = x.shape
    d, n, r = cfg.d_inner, cfg.d_state, cfg.dt_rank
    xz = linear(p["in_proj"], x)
    xx, z = xz[..., :d], xz[..., d:]
    if cfg.conv_impl == "fused" and cfg.d_conv == 3:
        from wavemamba_tpu.experimental.conv_fused import dw_act

        xx = dw_act(p["conv2d"], xx, "silu")
    else:
        xx = silu(conv2d(p["conv2d"], xx, padding=(cfg.d_conv - 1) // 2, groups=d))

    if cfg.scan_impl == "pallas_fused":
        # Fused projections+scan kernel: reads the token stream once per
        # direction pair, no xs/dts/Bs/Cs materialization. Differentiable —
        # the custom VJP dispatches the fused backward kernel, so training
        # gets the same read-once property (chunk-entry carries are the
        # only extra residual).
        from wavemamba_tpu.ops.scan_pallas import ss2d_scan_fused_diff

        At = -jnp.exp(p["A_logs"].astype(jnp.float32)).transpose(0, 2, 1)  # (4,N,D)
        wx_t = p["x_proj_w"].astype(jnp.float32).transpose(0, 2, 1)  # (4,D,34)
        dtw_t = p["dt_projs_w"].astype(jnp.float32).transpose(0, 2, 1)  # (4,R,D)
        bias = p["dt_projs_b"].astype(jnp.float32)
        dsk = p["Ds"].astype(jnp.float32)
        x0 = xx.reshape(b, h * w, d)
        xT = xx.transpose(0, 2, 1, 3).reshape(b, h * w, d)
        # reference direction order: 0=row fwd, 1=col fwd, 2=row rev, 3=col rev
        # scan_dtype selects the y STREAMING dtype (state math stays f32 in
        # VMEM): bf16 halves the kernel's HBM writes and every downstream
        # sum/transpose/LayerNorm read at 540p-level token counts.
        y_dt = None if cfg.scan_dtype == "float32" else cfg.scan_dtype
        pr = ss2d_scan_fused_diff(x0, wx_t[jnp.array([0, 2])], dtw_t[jnp.array([0, 2])],
                                  bias[jnp.array([0, 2])], At[jnp.array([0, 2])],
                                  dsk[jnp.array([0, 2])], cfg.scan_chunk, 8,
                                  None, y_dt)
        pc = ss2d_scan_fused_diff(xT, wx_t[jnp.array([1, 3])], dtw_t[jnp.array([1, 3])],
                                  bias[jnp.array([1, 3])], At[jnp.array([1, 3])],
                                  dsk[jnp.array([1, 3])], cfg.scan_chunk, 8,
                                  None, y_dt)
        y_rows = pr[:, 0] + pr[:, 1]  # (B, L, D)
        y_cols = (pc[:, 0] + pc[:, 1]).reshape(b, w, h, d).transpose(0, 2, 1, 3)
        y = (y_rows.reshape(b, h, w, d) + y_cols).astype(x.dtype)
        y = layer_norm(p["out_norm"], y, eps=1e-5)
        y = y * silu(z)
        return linear(p["out_proj"], y)

    xs = _scan_directions(xx)  # (B, 4, L, D)
    # Per-direction input projections -> (dt, B, C) with stacked weights.
    x_dbl = jnp.einsum("bkld,kcd->bklc", xs, p["x_proj_w"].astype(xs.dtype), precision=dot_precision(xs))
    dts = jnp.einsum("bklr,kdr->bkld", x_dbl[..., :r], p["dt_projs_w"].astype(xs.dtype), precision=dot_precision(xs))
    Bs = x_dbl[..., r : r + n]
    Cs = x_dbl[..., r + n :]
    A = -jnp.exp(p["A_logs"].astype(jnp.float32))  # (4, D, N)

    Dsk = p["Ds"].astype(jnp.float32)
    bias = p["dt_projs_b"].astype(jnp.float32)
    if cfg.scan_impl == "seq_sharded":
        # L sharded over the mesh axis (beyond-single-chip-memory path).
        # Zero-pad L to the axis size: padded tokens have u=0 so b_t=0 and
        # the state passes through them unchanged (outputs discarded).
        from wavemamba_tpu.parallel.seq_scan import selective_scan_seq_sharded

        if cfg.scan_mesh is None:
            raise ValueError("scan_impl='seq_sharded' requires cfg.scan_mesh")
        n_sh = cfg.scan_mesh.shape[cfg.scan_mesh_axis]
        L = xs.shape[2]
        padL = (-L) % n_sh
        if padL:
            padw = ((0, 0), (0, 0), (0, padL), (0, 0))
            xs, dts, Bs, Cs = (jnp.pad(t, padw) for t in (xs, dts, Bs, Cs))
        y = selective_scan_seq_sharded(
            xs, dts, A, Bs, Cs, Dsk, bias, mesh=cfg.scan_mesh,
            axis=cfg.scan_mesh_axis, chunk=cfg.scan_chunk,
            scan_dtype=jnp.dtype(cfg.scan_dtype),
        )[:, :, :L]
    else:
        y = selective_scan(
            xs, dts, A, Bs, Cs, Dsk, bias,
            impl=cfg.scan_impl, chunk=cfg.scan_chunk, sub=cfg.scan_sub,
            scan_dtype=jnp.dtype(cfg.scan_dtype),
        )  # (B, 4, L, D) float32
    y = _merge_directions(y, h, w).astype(x.dtype)
    y = layer_norm(p["out_norm"], y, eps=1e-5)
    y = y * silu(z)
    return linear(p["out_proj"], y)


# ---------------------------------------------------------------------------
# NAFNet-style gated FFN (`ffn`, wavemamba_arch.py:214-231).


def init_ffn(key, c, expand=2):
    k1, k2, k3 = jax.random.split(key, 3)
    dw = c * expand
    return {
        "conv1": init_conv2d(k1, 1, 1, c, dw),
        "conv2": init_conv2d(k2, 3, 3, dw, dw, groups=dw),
        "conv3": init_conv2d(k3, 1, 1, dw // 2, c),
    }


def ffn_apply(p, x, fuse=False, as_conv_1x1=False):
    if fuse:
        from wavemamba_tpu.experimental.conv_fused import ffn_chain

        return ffn_chain(p, x)
    dw = p["conv2"]["w"].shape[-1]
    y = conv2d(p["conv1"], x, as_conv=as_conv_1x1)
    y = conv2d(p["conv2"], y, padding=1, groups=dw)
    y1, y2 = y[..., : dw // 2], y[..., dw // 2 :]
    return conv2d(p["conv3"], gelu(y1) * y2, as_conv=as_conv_1x1)


# ---------------------------------------------------------------------------
# LFSSBlock (`wavemamba_arch.py:499-528`).


def init_lfss_block(key, cfg: WaveMambaConfig):
    c = cfg.wf
    k1, k2 = jax.random.split(key)
    return {
        "ln_1": init_layer_norm(c),
        "self_attention": init_ss2d(k1, cfg),
        "skip_scale": jnp.ones((c,), jnp.float32),
        "ln_2": init_layer_norm(c),
        "conv_blk": init_ffn(k2, c),
        "skip_scale2": jnp.ones((c,), jnp.float32),
    }


def lfss_block_apply(p, cfg: WaveMambaConfig, x):
    """x: (B, H, W, C) -> same. (The reference flattens to (B, HW, C) and
    back per block; in NHWC that round-trip is a no-op, so we keep 4-D.)"""
    y = layer_norm(p["ln_1"], x, eps=1e-6)
    x = x * p["skip_scale"].astype(x.dtype) + ss2d_apply(p["self_attention"], cfg, y)
    if cfg.conv_impl == "fused":
        # whole second half-block (LN + ffn + scaled residual) in ONE kernel
        from wavemamba_tpu.experimental.conv_fused import lfss_ffn_block

        return lfss_ffn_block(p["ln_2"], p["conv_blk"], p["skip_scale2"], x)
    x = x * p["skip_scale2"].astype(x.dtype) + ffn_apply(
        p["conv_blk"], layer_norm(p["ln_2"], x, eps=1e-5),
        as_conv_1x1="ffn" in cfg.conv1x1_as_conv,
    )
    return x


# ---------------------------------------------------------------------------
# High-frequency enhancement: Matching / PAConv / CMTAttention / FeedForward
# / HFEBlock (`wavemamba_arch.py:608-854`). All with the shipped settings
# match_factor=1, ffn_expansion_factor=1, num_heads=1 (DownFRG/upFRG ctor,
# `wavemamba_arch.py:970,994`).


def matching(x, perc):
    """Per-channel nearest-neighbour selection from `perc` by L2 distance
    over flattened spatial maps (`wavemamba_arch.py:659-680`).

    With match_factor=1 the reference's sort/mask machinery reduces to: for
    each channel of x, pick the perception channel with the smallest
    euclidean distance. x, perc: (B, H, W, C) -> (B, H, W, C).
    """
    b, h, w, c = x.shape
    xf = x.reshape(b, h * w, c).astype(jnp.float32)
    pf = perc.reshape(b, h * w, c).astype(jnp.float32)
    # d2[b, i, j] = ||x_i - p_j||^2 via the expanded form (MXU matmul over L).
    x2 = jnp.sum(xf * xf, axis=1)  # (B, C)
    p2 = jnp.sum(pf * pf, axis=1)  # (B, C)
    xp = jnp.einsum("bli,blj->bij", xf, pf, precision=dot_precision(xf))
    d2 = x2[:, :, None] + p2[:, None, :] - 2.0 * xp
    idx = jnp.argmin(d2, axis=-1)  # (B, C): nearest perc channel per x channel
    sel = jnp.take_along_axis(perc.reshape(b, h * w, c), idx[:, None, :], axis=-1)
    return sel.reshape(b, h, w, c)


def init_paconv(key, nf):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "k2": init_conv2d(k1, 1, 1, nf, nf),
        "k3": init_conv2d(k2, 3, 3, nf, nf, bias=False),
        "k4": init_conv2d(k3, 3, 3, nf, nf // 2, bias=False),
    }


def paconv_apply(p, x, fuse=False, as_conv_1x1=False):
    if fuse:
        from wavemamba_tpu.experimental.conv_fused import paconv_chain

        return paconv_chain(p, x)
    y = jax.nn.sigmoid(conv2d(p["k2"], x, as_conv=as_conv_1x1))
    return conv2d(p["k4"], conv2d(p["k3"], x, padding=1) * y, padding=1)


def init_matching_transformation(key, c):
    return {"paconv": init_paconv(key, 2 * c)}


def matching_transformation_apply(p, x, perc, fuse=False, as_conv_1x1=False):
    sel = matching(x, perc)
    return paconv_apply(p["paconv"], jnp.concatenate([x, sel], axis=-1),
                        fuse=fuse, as_conv_1x1=as_conv_1x1)


def init_cmt_attention(key, c, num_heads=1):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "temperature": jnp.ones((num_heads,), jnp.float32),
        "qkv": init_conv2d(k1, 1, 1, c, 3 * c),
        "qkv_dwconv": init_conv2d(k2, 3, 3, 3 * c, 3 * c, groups=3 * c),
        "project_out": init_conv2d(k3, 1, 1, c, c),
        "matching_transformation": init_matching_transformation(k4, c),
    }


def cmt_attention_apply(p, x, perc, num_heads=1, fuse=False, ln=None,
                        as_conv_1x1=False):
    """Transposed (channel) attention with perception-matched queries
    (`wavemamba_arch.py:772-798`).

    Layout note: the reference materializes (B, heads, C/heads, L) tensors
    (rearrange to 'b head c (h w)') before its matmuls. With L ~ 500k that
    layout puts the TOKEN axis in the minor dims — multiple full-size
    relayouts per block on TPU. All three contractions here are expressed
    over the (B, L, heads, C/heads) layout directly (the L axis is only
    ever contracted or broadcast), so no (C, L) tensor ever exists. Same
    math, same outputs."""
    b, h, w, c = x.shape
    ch = c // num_heads
    if fuse:
        from wavemamba_tpu.experimental.conv_fused import qkv_chain

        qkv = qkv_chain(p, x, ln=ln)  # ln folds the block's norm1 in
    else:
        qkv = conv2d(p["qkv_dwconv"], conv2d(p["qkv"], x, as_conv=as_conv_1x1),
                     padding=1, groups=3 * c)
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    q = matching_transformation_apply(p["matching_transformation"], q, perc,
                                      fuse=fuse, as_conv_1x1=as_conv_1x1)

    def heads(t):  # (B,H,W,C) -> (B, L, heads, C/heads) — a free reshape
        return t.reshape(b, h * w, num_heads, ch)

    qh, kh, vh = heads(q), heads(k), heads(v)
    # F.normalize over the token axis (dim=-1 in the reference's (.., C, L))
    qh = l2_normalize(qh, axis=1)
    kh = l2_normalize(kh, axis=1)
    temp = p["temperature"].astype(qh.dtype)[None, :, None, None]
    attn = jnp.einsum("blhc,blhd->bhcd", qh, kh, precision=dot_precision(qh)) * temp
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhcd,blhd->blhc", attn, vh, precision=dot_precision(vh))
    # project_out's input comes from the token-layout attention einsum, so
    # it stays a matmul regardless of the 1x1 layout policy.
    return conv2d(p["project_out"], out.reshape(b, h, w, c))


def init_feed_forward(key, c):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "project_in": [init_conv2d(k1, 1, 1, c, c), init_conv2d(k2, 3, 3, c, c, groups=c)],
        "matching_transformation": init_matching_transformation(k3, c),
        "project_out": [init_conv2d(k4, 3, 3, c, c, groups=c), init_conv2d(k5, 1, 1, c, c)],
    }


def feed_forward_apply(p, x, perc, fuse=False, ln=None, as_conv_1x1=False):
    c = x.shape[-1]
    if fuse:
        from wavemamba_tpu.experimental.conv_fused import ff_in_chain, ff_out_chain

        y = ff_in_chain(p["project_in"], x, ln=ln)
        y = matching_transformation_apply(p["matching_transformation"], y, perc, fuse=True)
        return ff_out_chain(p["project_out"], y)
    y = conv2d(p["project_in"][0], x, as_conv=as_conv_1x1)
    y = conv2d(p["project_in"][1], y, padding=1, groups=c)
    y = matching_transformation_apply(p["matching_transformation"], y, perc,
                                      as_conv_1x1=as_conv_1x1)
    y = conv2d(p["project_out"][0], y, padding=1, groups=c)
    return conv2d(p["project_out"][1], gelu(y), as_conv=as_conv_1x1)


def init_feed_forward_restormer(key, c, expand=1):
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = int(c * expand)
    return {
        "project_in": init_conv2d(k1, 1, 1, c, 2 * hidden),
        "dwconv": init_conv2d(k2, 3, 3, 2 * hidden, 2 * hidden, groups=2 * hidden),
        "project_out": init_conv2d(k3, 1, 1, hidden, c),
    }


def feed_forward_restormer_apply(p, x, fuse=False, ln=None, residual=False):
    if fuse:
        from wavemamba_tpu.experimental.conv_fused import restormer_chain

        return restormer_chain(p, x, ln=ln, residual=residual)
    y = conv2d(p["project_in"], x)
    dw = p["dwconv"]["w"].shape[-1]
    y = conv2d(p["dwconv"], y, padding=1, groups=dw)
    y1, y2 = y[..., : dw // 2], y[..., dw // 2 :]
    return conv2d(p["project_out"], gelu(y1) * y2)


def init_hfe_block(key, c, ffn_restormer=False):
    k1, k2 = jax.random.split(key)
    p = {
        "norm1": init_layer_norm(c),
        "attn": init_cmt_attention(k1, c),
        "norm2": init_layer_norm(c),
        "LayerNorm": init_layer_norm(c),
    }
    if ffn_restormer:
        p["ffn"] = init_feed_forward_restormer(k2, c)
    else:
        p["ffn"] = init_feed_forward(k2, c)
    return p


def hfe_block_apply(p, x, perc, ffn_restormer=False, fuse=False,
                    as_conv_1x1=False):
    """`wavemamba_arch.py:847-854`. LayerNorm2d == channel LN (eps 1e-6)."""
    percn = layer_norm(p["LayerNorm"], perc, eps=1e-6)
    if fuse:
        # the block LNs fold into the first chain of each half-block
        ln1 = (p["norm1"]["g"], p["norm1"]["b"], 1e-6)
        ln2 = (p["norm2"]["g"], p["norm2"]["b"], 1e-6)
        x = x + cmt_attention_apply(p["attn"], x, percn, fuse=True, ln=ln1)
        if ffn_restormer:
            return feed_forward_restormer_apply(p["ffn"], x, fuse=True,
                                                ln=ln2, residual=True)
        return x + feed_forward_apply(p["ffn"], x, percn, fuse=True, ln=ln2)
    x = x + cmt_attention_apply(p["attn"], layer_norm(p["norm1"], x, eps=1e-6),
                                percn, as_conv_1x1=as_conv_1x1)
    if ffn_restormer:
        x = x + feed_forward_restormer_apply(p["ffn"], layer_norm(p["norm2"], x, eps=1e-6))
    else:
        x = x + feed_forward_apply(p["ffn"], layer_norm(p["norm2"], x, eps=1e-6),
                                   percn, as_conv_1x1=as_conv_1x1)
    return x


# ---------------------------------------------------------------------------
# SKFF — selective kernel fusion of the three high-freq subbands
# (`wavemamba_arch.py:923-959`).


def init_skff(key, c, height=3, reduction=8):
    d = max(c // reduction, 4)
    keys = jax.random.split(key, height + 1)
    return {
        "conv_du": {"conv": init_conv2d(keys[0], 1, 1, c, d, bias=False),
                    "prelu": {"a": jnp.full((1,), 0.25, jnp.float32)}},
        "fcs": [init_conv2d(keys[i + 1], 1, 1, d, c, bias=False) for i in range(height)],
    }


def skff_apply(p, feats):
    u = feats[0]
    for f in feats[1:]:
        u = u + f
    s = jnp.mean(u, axis=(1, 2), keepdims=True)
    z = prelu(p["conv_du"]["prelu"], conv2d(p["conv_du"]["conv"], s))
    att = jnp.stack([conv2d(fc, z) for fc in p["fcs"]], axis=0)  # (height, B,1,1,C)
    att = jax.nn.softmax(att, axis=0)
    out = att[0] * feats[0]
    for i in range(1, len(feats)):
        out = out + att[i] * feats[i]
    return out


# ---------------------------------------------------------------------------
# DownFRG / upFRG / UNet (`wavemamba_arch.py:962-1063`).


def init_down_frg(key, cfg: WaveMambaConfig, n_l, n_h):
    c = cfg.wf
    keys = jax.random.split(key, 2 + n_l + n_h)
    return {
        "l_conv": init_conv2d(keys[0], 3, 3, 2 * c, c),
        "l_blk": [init_lfss_block(keys[2 + i], cfg) for i in range(n_l)],
        "h_fusion": init_skff(keys[1], c),
        "h_blk": [init_hfe_block(keys[2 + n_l + i], c, cfg.ffn_restormer) for i in range(n_h)],
    }


def _maybe_remat(fn, cfg):
    if not cfg.remat:
        return fn
    if cfg.remat_policy == "save_scan" and cfg.scan_impl == "pallas_fused":
        # Save the fused scan kernel's outputs + residuals across the block
        # remat (everything else — convs, norms, projections — recomputes).
        # Costs ~100 MB/block of saved bf16 y + f32 carries at training
        # shapes; removes the duplicate scan forward from the backward.
        policy = jax.checkpoint_policies.save_only_these_names("ss2d_scan")
        return jax.checkpoint(fn, policy=policy)
    return jax.checkpoint(fn)


def down_frg_apply(p, cfg: WaveMambaConfig, x, x_d):
    # Reduced-precision paths take the MXU conv formulation of the Haar
    # transform (same math, ~10x faster than parity-strided slicing on
    # TPU); float32 keeps the bit-parity slicing reference.
    haar = dwt2 if cfg.compute_dtype == "float32" else dwt2_conv
    ll, hl, lh, hh = haar(x)
    ll_in = jnp.concatenate([ll, x_d], axis=-1)
    if cfg.conv_impl == "fused":
        from wavemamba_tpu.experimental.conv_fused import dense3x3

        ll = dense3x3(p["l_conv"], ll_in)
    else:
        ll = conv2d(p["l_conv"], ll_in, padding=1)
    lfss = _maybe_remat(lambda bp, t: lfss_block_apply(bp, cfg, t), cfg)
    hfe = _maybe_remat(
        lambda bp, t, pc: hfe_block_apply(bp, t, pc, cfg.ffn_restormer,
                                          fuse=cfg.conv_impl == "fused",
                                          as_conv_1x1="hfe" in cfg.conv1x1_as_conv), cfg
    )
    for blk in p["l_blk"]:
        ll = lfss(blk, ll)
    xh = skff_apply(p["h_fusion"], [hl, lh, hh])
    for blk in p["h_blk"]:
        xh = hfe(blk, xh, ll)
    return ll, xh


def init_up_frg(key, cfg: WaveMambaConfig, n_l, n_h):
    c = cfg.wf
    keys = jax.random.split(key, 1 + n_l + n_h)
    return {
        "l_blk": [init_lfss_block(keys[1 + i], cfg) for i in range(n_l)],
        "h_out_conv": init_conv2d(keys[0], 3, 3, c, 3 * c),
        "h_blk": [init_hfe_block(keys[1 + n_l + i], c, cfg.ffn_restormer) for i in range(n_h)],
    }


def up_frg_apply(p, cfg: WaveMambaConfig, x_l, x_h):
    lfss = _maybe_remat(lambda bp, t: lfss_block_apply(bp, cfg, t), cfg)
    hfe = _maybe_remat(
        lambda bp, t, pc: hfe_block_apply(bp, t, pc, cfg.ffn_restormer,
                                          fuse=cfg.conv_impl == "fused",
                                          as_conv_1x1="hfe" in cfg.conv1x1_as_conv), cfg
    )
    for blk in p["l_blk"]:
        x_l = lfss(blk, x_l)
    for blk in p["h_blk"]:
        x_h = hfe(blk, x_h, x_l)
    if cfg.conv_impl == "fused":
        from wavemamba_tpu.experimental.conv_fused import dense3x3

        x_h = dense3x3(p["h_out_conv"], x_h)
    else:
        x_h = conv2d(p["h_out_conv"], x_h, padding=1)
    return iwt2_cat(jnp.concatenate([x_l, x_h], axis=-1))


def init_unet(key, cfg: WaveMambaConfig):
    c, ic = cfg.wf, cfg.in_chn
    keys = jax.random.split(key, 11)
    nl, nh = cfg.n_l_blocks, cfg.n_h_blocks
    return {
        "ps_down1": init_conv2d(keys[0], 1, 1, 4 * ic, c),
        "ps_down2": init_conv2d(keys[1], 1, 1, 16 * ic, c),
        "ps_down3": init_conv2d(keys[2], 1, 1, 64 * ic, c),
        "conv_01": init_conv2d(keys[3], 3, 3, ic, c),
        "down_group1": init_down_frg(keys[4], cfg, nl[0], nh[0]),
        "down_group2": init_down_frg(keys[5], cfg, nl[1], nh[1]),
        "down_group3": init_down_frg(keys[6], cfg, nl[2], nh[2]),
        "up_group3": init_up_frg(keys[7], cfg, nl[2], nh[2]),
        "up_group2": init_up_frg(keys[8], cfg, nl[1], nh[1]),
        "up_group1": init_up_frg(keys[9], cfg, nl[0], nh[0]),
        "last": init_conv2d(keys[10], 3, 3, c, ic),
    }


def _ps_down(p1x1, x, r):
    """PixelUnshuffle(r) + 1x1 conv as ONE dense rxr stride-r conv.

    torch pixel-unshuffle channel order is cin*r^2 + dy*r + dx
    (`arch_util.py:189`), so the 1x1 weight (1, 1, cin*r^2, cout) reshapes
    directly into an (r, r, cin, cout) HWIO kernel. Identical math to
    unshuffle-then-1x1, but skips materializing the unshuffled tensor
    (a measured 3.8 ms relayout at 1080p vs one MXU conv pass).
    """
    w = p1x1["w"]
    cin = x.shape[-1]
    cout = w.shape[-1]
    kern = w.reshape(cin, r, r, cout).transpose(1, 2, 0, 3)
    dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), (r, r), "VALID", dimension_numbers=dn,
        precision=dot_precision(x),
    )
    return y + p1x1["b"].astype(y.dtype)


def unet_apply(p, cfg: WaveMambaConfig, x):
    """x: (B, H, W, in_chn), H and W multiples of 8. Global residual output."""
    img = x
    if cfg.compute_dtype == "float32":  # bit-parity formulation
        d1 = conv2d(p["ps_down1"], pixel_unshuffle(x, 2))
        d2 = conv2d(p["ps_down2"], pixel_unshuffle(x, 4))
        d3 = conv2d(p["ps_down3"], pixel_unshuffle(x, 8))
    else:
        d1 = _ps_down(p["ps_down1"], x, 2)
        d2 = _ps_down(p["ps_down2"], x, 4)
        d3 = _ps_down(p["ps_down3"], x, 8)
    if cfg.conv_impl == "fused":
        from wavemamba_tpu.experimental.conv_fused import dense3x3

        x1 = dense3x3(p["conv_01"], img.astype(x.dtype))
    else:
        x1 = conv2d(p["conv_01"], img, padding=1)
    x_l, xh1 = down_frg_apply(p["down_group1"], cfg, x1, d1)
    x_l, xh2 = down_frg_apply(p["down_group2"], cfg, x_l, d2)
    x_l, xh3 = down_frg_apply(p["down_group3"], cfg, x_l, d3)
    x_l = up_frg_apply(p["up_group3"], cfg, x_l, xh3)
    x_l = up_frg_apply(p["up_group2"], cfg, x_l, xh2)
    x_l = up_frg_apply(p["up_group1"], cfg, x_l, xh1)
    if cfg.conv_impl == "fused":
        from wavemamba_tpu.experimental.conv_fused import dense3x3

        return dense3x3(p["last"], x_l) + img
    return conv2d(p["last"], x_l, padding=1) + img


# ---------------------------------------------------------------------------
# WaveMamba wrapper (`wavemamba_arch.py:1066-1176`).


def init_wavemamba(key, cfg: WaveMambaConfig):
    return {"restoration_network": init_unet(key, cfg)}


def wavemamba_apply(params, cfg: WaveMambaConfig, x):
    in_dtype = x.dtype
    if cfg.compute_dtype != "float32":
        x = x.astype(jnp.dtype(cfg.compute_dtype))
    out = unet_apply(params["restoration_network"], cfg, x)
    return out.astype(in_dtype)


def pad_to_multiple(x, multiple=8):
    """Reflect-pad H, W (bottom/right) to a multiple; returns (padded, h, w).

    Mirrors `check_image_size` (`wavemamba_arch.py:1153-1160`) and the
    inference CLI's pad-to-128 (`inference_wavemamba.py:28-36`).
    """
    b, h, w, c = x.shape
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    return x, h, w


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
