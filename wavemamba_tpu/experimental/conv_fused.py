"""Fused spatial conv-chain Pallas kernels — MEASURED NEGATIVE RESULT.

QUARANTINED (round 4): the round-3 on-chip sweep (BENCH_NOTES.md "fused
conv-chain kernels ON CHIP") measured these kernels at best at parity and
usually 0.3-1.5 ms SLOWER per chain than XLA; the full 1080p model is
231.5 ms fused vs 216.3 ms XLA. XLA's conv fusions + layout assignment
win on this op mix. Kept under `experimental/` (reachable only via
``WaveMambaConfig(conv_impl='fused')``, never default) as the working
artifact behind that negative result.

Round-2 measurement (BENCH_NOTES.md "1x1-conv lowering"): XLA's TPU conv
path costs a FIXED ~0.7-1 ms per call at 540p regardless of channel width,
so the model is conv-COUNT-bound — the ~40 remaining 3x3/depthwise convs
(HFE chains `wavemamba_arch.py:659-819`, LFSS ffn `:214-231`, SS2D dwconv
`:446`) are ~40 ms of pure dispatch @1080p. This module collapses each
multi-conv chain into ONE pallas_call.

Design:
  * The image is zero-padded by one tile on every side and gridded into
    (tile_h, tile_w) spatial tiles; each grid step reads the 3x3
    neighborhood of tiles (9 block refs — Mosaic double-buffers them) and
    assembles a (tile_h + 2*halo, tile_w + 2*halo) working tile in VMEM,
    where `halo` = number of 3x3 stages in the chain. Zero padding
    reproduces the reference's conv SAME semantics at image borders.
  * Stages run entirely in VMEM/vregs: pointwise convs and dense 3x3s are
    MXU dots (bf16 operands, f32 accumulation — the same contract XLA's
    bf16 convs use); depthwise 3x3s and activations are f32 VPU ops.
    Each 3x3 stage consumes one ring of halo (VALID on the padded tile).
  * One HBM read of the input (x9 small-tile amplification for the halo
    neighborhoods), one write of the output — and ONE kernel launch where
    XLA dispatched 2-4 convs.

Chain DSL (static per call): a tuple of stages
    ("pw",    w (Cin, Co),       b | None)   1x1 conv, MXU
    ("dense", w (3, 3, Cin, Co), b | None)   dense 3x3, 9 MXU dots
    ("dw",    w (3, 3, C),       b | None)   depthwise 3x3, VPU
    ("act",   name)                          'gelu' | 'silu' | 'sigmoid'
    ("glu",   name)                          y = act(y[..:C/2]) * y[C/2:..]
    ("mulsig0", w (Cin, Co), b | None)       y *= sigmoid(x_in @ w + b)
                                             (PAConv's gating branch on the
                                             chain INPUT, `:640-657`)
    ("ln", g, b, eps)                        channel LayerNorm, f32 stats
    ("res0", scale | None)                   y += [scale *] chain input
                                             (fuses block residuals in)

Inference-path only (no custom VJP); training keeps the XLA conv lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _act(name, x):
    # f32 compute: Mosaic's bf16 logistic lowering mis-verifies (f32 scalar
    # broadcast into a bf16 vector), and f32 transcendentals are the same
    # VPU cost. Cast back to the chain's working dtype on the way out.
    xf = x.astype(jnp.float32)
    if name == "gelu":
        # Mosaic has no erf/erfc lowering; the tanh form's max deviation
        # from exact GELU (~3e-3 absolute) sits below the bf16 rounding
        # noise these reduced-precision chains already carry. The fp32
        # parity path (conv_impl='xla') keeps the exact erf GELU.
        y = jax.nn.gelu(xf, approximate=True)
    elif name == "silu":
        y = jax.nn.silu(xf)
    elif name == "sigmoid":
        y = jax.nn.sigmoid(xf)
    else:
        raise ValueError(name)
    return y.astype(x.dtype)


def _mxu_dot(a, w, out_dtype):
    """(R, W, Cin) @ (Cin, Co); bf16 operands, f32 MXU accumulation, result
    cast back to the chain's working dtype (keeps VMEM pressure down — the
    16 MB default scoped-VMEM budget is the binding constraint)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _chain_kernel(*refs, stages, halo, th, tw, n_weights, H, W):
    # refs: 9 neighborhood blocks (row-major), then weight refs, then out.
    blocks = refs[:9]
    w_refs = refs[9 : 9 + n_weights]
    out_ref = refs[9 + n_weights]

    h = halo

    def blk(i, j):
        return blocks[i * 3 + j][0]  # (th, tw, C)

    if h:
        top = jnp.concatenate(
            [blk(0, 0)[-h:, -h:], blk(0, 1)[-h:, :], blk(0, 2)[-h:, :h]], axis=1
        )
        mid = jnp.concatenate(
            [blk(1, 0)[:, -h:], blk(1, 1), blk(1, 2)[:, :h]], axis=1
        )
        bot = jnp.concatenate(
            [blk(2, 0)[:h, -h:], blk(2, 1)[:h, :], blk(2, 2)[:h, :h]], axis=1
        )
        t = jnp.concatenate([top, mid, bot], axis=0)  # (th+2h, tw+2h, C)
    else:
        t = blk(1, 1)

    # Working dtype: f32 for elementwise/VPU stages (bf16 elementwise on
    # the VPU pays convert penalties), bf16 only as MXU dot operands. The
    # raised vmem_limit_bytes accommodates the f32 intermediates at the
    # small default tile.
    wdt = jnp.float32
    t = t.astype(wdt)
    x0 = t
    cur = t
    cur_h = h  # remaining halo rings around the (th, tw) core
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    def mask_outside(v, ring):
        """Zero positions outside the image (global rows [0,H), cols [0,W)).

        A conv's SAME padding zeroes ITS OWN input, but a preceding stage
        with bias (or any non-zero-preserving op) maps the canvas padding to
        nonzero values — every spatial stage must therefore re-zero the
        outside-image region of its input (caught by tests/test_conv_fused).
        `ring` = halo rings still around the (th, tw) core of v."""
        R, Cw, _ = v.shape
        r0 = ti * th - ring  # global row of v[0]
        c0 = tj * tw - ring
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, Cw, 1), 0) + r0
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, Cw, 1), 1) + c0
        ok = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
        return jnp.where(ok, v, jnp.zeros_like(v))

    # Static tracking: does the outside-image region still hold zeros?
    # (True until a stage maps 0 -> nonzero; lets spatial stages skip the
    # mask when it would be a no-op.)
    pad_is_zero = True

    wi = 0
    for stage in stages:
        kind = stage[0]
        if kind == "pw":
            w = w_refs[wi][...]
            wi += 1
            b = None
            if stage[2]:
                b = w_refs[wi][...]
                wi += 1
            cur = _mxu_dot(cur, w, wdt)
            if b is not None:
                cur = cur + b[0].astype(wdt)
                pad_is_zero = False
        elif kind == "dense":
            w = w_refs[wi][...]
            wi += 1
            b = None
            if stage[2]:
                b = w_refs[wi][...]
                wi += 1
            if not pad_is_zero:
                cur = mask_outside(cur, cur_h)
                pad_is_zero = True
            R, C_, _ = cur.shape
            # 3 sublane (dx) shifts hoisted out of the tap loop — sublane
            # slices are relayouts, row (dy) slices are free (untiled dim).
            xs_dx = [
                cur[:, dx : C_ - 2 + dx, :].astype(jnp.bfloat16)
                for dx in range(3)
            ]
            acc = None
            for dy in range(3):
                for dx in range(3):
                    part = jax.lax.dot_general(
                        xs_dx[dx][dy : R - 2 + dy],
                        w[dy, dx].astype(jnp.bfloat16),
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
            cur = acc.astype(wdt)  # f32 accumulation across all 9 taps
            if b is not None:
                cur = cur + b[0].astype(wdt)
            # outside-image positions now hold convolutions that mixed in
            # real border pixels — never zero after a spatial stage.
            pad_is_zero = False
            cur_h -= 1
        elif kind == "dw":
            w = w_refs[wi][...]
            wi += 1
            b = None
            if stage[2]:
                b = w_refs[wi][...]
                wi += 1
            if not pad_is_zero:
                cur = mask_outside(cur, cur_h)
                pad_is_zero = True
            R, C_, _ = cur.shape
            wk = w[...].astype(wdt)
            # hoist the 3 sublane (dx) shifts; row (dy) slices are free
            xs_dx = [cur[:, dx : C_ - 2 + dx, :] for dx in range(3)]
            acc = None
            for dy in range(3):
                for dx in range(3):
                    part = xs_dx[dx][dy : R - 2 + dy] * wk[dy, dx][None, None, :]
                    acc = part if acc is None else acc + part
            cur = acc
            if b is not None:
                cur = cur + b[0].astype(wdt)
            pad_is_zero = False  # see dense note: border mixing, not bias
            cur_h -= 1
        elif kind == "act":
            cur = _act(stage[1], cur)
            if stage[1] == "sigmoid":
                pad_is_zero = False
        elif kind == "glu":
            half = cur.shape[-1] // 2
            cur = _act(stage[1], cur[..., :half]) * cur[..., half:]
        elif kind == "mulsig0":
            w = w_refs[wi][...]
            wi += 1
            b = None
            if stage[2]:
                b = w_refs[wi][...]
                wi += 1
            off = h - cur_h
            R0, C0, _ = x0.shape
            x0c = x0[off : R0 - off, off : C0 - off, :]
            g = _mxu_dot(x0c, w, wdt)
            if b is not None:
                g = g + b[0].astype(wdt)
            cur = cur * _act("sigmoid", g)
        elif kind == "ln":
            g = w_refs[wi][...]
            wi += 1
            bb = w_refs[wi][...]
            wi += 1
            cur = _ln(cur, g, bb, stage[1], wdt)
            pad_is_zero = False  # the LN bias lands on the canvas
        elif kind == "res0":
            off = h - cur_h
            R0, C0, _ = x0.shape
            x0c = x0[off : R0 - off, off : C0 - off, :]
            if stage[1]:
                s = w_refs[wi][...]
                wi += 1
                x0c = x0c * s[0].astype(wdt)
            cur = cur + x0c
        else:
            raise ValueError(kind)

    out_ref[0] = cur.astype(out_ref.dtype)


def _ln(cur, g, b, eps, wdt):
    """LayerNorm over channels, f32 statistics (ops/nn.py:84-91)."""
    xf = cur.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * g[0].astype(jnp.float32) + b[0].astype(jnp.float32)).astype(wdt)


def _normalize_stages(stages):
    """-> (static_spec, weight_arrays). Biases become (1, C) rows."""
    spec = []
    weights = []
    for stage in stages:
        kind = stage[0]
        if kind in ("act", "glu"):
            spec.append((kind, stage[1]))
            continue
        if kind == "ln":
            weights.append(jnp.asarray(stage[1]).reshape(1, -1))
            weights.append(jnp.asarray(stage[2]).reshape(1, -1))
            spec.append(("ln", float(stage[3])))
            continue
        if kind == "res0":
            if stage[1] is not None:
                weights.append(jnp.asarray(stage[1]).reshape(1, -1))
            spec.append(("res0", stage[1] is not None))
            continue
        w, b = stage[1], stage[2]
        weights.append(jnp.asarray(w))
        if b is not None:
            weights.append(jnp.asarray(b).reshape(1, -1))
        spec.append((kind, None, b is not None))
    return tuple(spec), weights


@functools.partial(
    jax.jit, static_argnames=("spec", "tile_h", "tile_w", "interpret")
)
def _fused_chain_jit(x, weights, spec, tile_h, tile_w, interpret):
    interpret = _resolve_interpret(interpret)
    B, H, W, C = x.shape
    halo = sum(1 for s in spec if s[0] in ("dense", "dw"))
    th, tw = tile_h, tile_w

    nh = -(-H // th)
    nw = -(-W // tw)
    # Zero-pad: one full tile ring (SAME-padding semantics at the borders)
    # plus round H/W up to tile multiples.
    x_p = jnp.pad(
        x, ((0, 0), (th, nh * th - H + th), (tw, nw * tw - W + tw), (0, 0))
    )

    # Output channel count: trace the channel arithmetic statically.
    cout = C
    wi = 0
    warrs = list(weights)
    for s in spec:
        if s[0] == "pw":
            cout = warrs[wi].shape[-1]
            wi += 1 + (1 if s[2] else 0)
        elif s[0] == "dense":
            cout = warrs[wi].shape[-1]
            wi += 1 + (1 if s[2] else 0)
        elif s[0] == "dw":
            wi += 1 + (1 if s[2] else 0)
        elif s[0] == "mulsig0":
            wi += 1 + (1 if s[2] else 0)
        elif s[0] == "ln":
            wi += 2
        elif s[0] == "res0":
            wi += 1 if s[1] else 0
        elif s[0] == "glu":
            cout = cout // 2

    grid = (B, nh, nw)

    def nb_spec(di, dj):
        return pl.BlockSpec(
            (1, th, tw, C),
            lambda b, i, j, di=di, dj=dj: (b, i + di, j + dj, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [nb_spec(di, dj) for di in range(3) for dj in range(3)]
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, i, j: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    in_specs += [full(w) for w in weights]
    out_spec = pl.BlockSpec(
        (1, th, tw, cout), lambda b, i, j: (b, i, j, 0),
        memory_space=pltpu.VMEM,
    )

    y = pl.pallas_call(
        functools.partial(
            _chain_kernel, stages=spec, halo=halo, th=th, tw=tw,
            n_weights=len(weights), H=H, W=W,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, nh * th, nw * tw, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*([x_p] * 9), *weights)

    return y[:, :H, :W]


def fused_chain(x, stages, tile_h=8, tile_w=128, interpret=None):
    """Run a conv chain (see module docstring DSL) in one Pallas kernel.

    x: (B, H, W, C). Returns (B, H, W, Cout) in x.dtype.
    """
    spec, weights = _normalize_stages(stages)
    return _fused_chain_jit(x, weights, spec, tile_h, tile_w, interpret)


# --------------------------------------------------------------------------
# Row-band variant: full-width bands instead of 2-D tiles.
#
# The 2-D tiling above re-reads every input block 9x (the 3x3 block
# neighborhood) — at 540p that alone exceeds XLA's whole conv time. Bands
# cut the halo amplification to 3x (top/mid/bottom band fetches), reduce
# the grid to H/band_h steps (vs H*W/(th*tw) — ~4x less per-step overhead),
# and keep the width CONSTANT through the chain: spatial stages use
# SAME-style column shifts with zero fill (the zeros beyond the image edge
# are exactly what mask_outside maintains), so only rows consume halo.


def _band_kernel(top_ref, mid_ref, bot_ref, *rest, stages, halo, tb,
                 n_weights, H, W):
    w_refs = rest[:n_weights]
    out_ref = rest[n_weights]
    h = halo
    if h:
        t = jnp.concatenate(
            [top_ref[0][-h:], mid_ref[0], bot_ref[0][:h]], axis=0
        )  # (tb + 2h, Wp, C)
    else:
        t = mid_ref[0]

    wdt = jnp.float32
    t = t.astype(wdt)
    x0 = t
    cur = t
    cur_h = h
    bi = pl.program_id(1)

    def mask_outside(v, ring):
        # rows: global row of v[0] is bi*tb - ring; cols: block covers
        # [0, Wp) of which [0, W) is image.
        R, Cw, _ = v.shape
        r0 = bi * tb - ring
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, Cw, 1), 0) + r0
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, Cw, 1), 1)
        ok = (rows >= 0) & (rows < H) & (cols < W)
        return jnp.where(ok, v, jnp.zeros_like(v))

    def col_shifts(v, dtype):
        """[shift +1 (left-neighbor), identity, shift -1] with zero fill —
        SAME handling on the width axis (sublane shifts)."""
        z = jnp.zeros_like(v[:, :1]).astype(dtype)
        vv = v.astype(dtype)
        return [
            jnp.concatenate([z, vv[:, :-1]], axis=1),
            vv,
            jnp.concatenate([vv[:, 1:], z], axis=1),
        ]

    pad_is_zero = True
    wi = 0
    for stage in stages:
        kind = stage[0]
        if kind == "pw":
            w = w_refs[wi][...]
            wi += 1
            b = None
            if stage[2]:
                b = w_refs[wi][...]
                wi += 1
            cur = _mxu_dot(cur, w, wdt)
            if b is not None:
                cur = cur + b[0].astype(wdt)
                pad_is_zero = False
        elif kind in ("dense", "dw"):
            w = w_refs[wi][...]
            wi += 1
            b = None
            if stage[2]:
                b = w_refs[wi][...]
                wi += 1
            if not pad_is_zero:
                cur = mask_outside(cur, cur_h)
                pad_is_zero = True
            R = cur.shape[0]
            if kind == "dense":
                xs = col_shifts(cur, jnp.bfloat16)
                acc = None
                for dy in range(3):
                    for dx in range(3):
                        part = jax.lax.dot_general(
                            xs[dx][dy : R - 2 + dy],
                            w[dy, dx].astype(jnp.bfloat16),
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        acc = part if acc is None else acc + part
                cur = acc.astype(wdt)
            else:
                wk = w[...].astype(wdt)
                xs = col_shifts(cur, wdt)
                acc = None
                for dy in range(3):
                    for dx in range(3):
                        part = xs[dx][dy : R - 2 + dy] * wk[dy, dx][None, None, :]
                        acc = part if acc is None else acc + part
                cur = acc
            if b is not None:
                cur = cur + b[0].astype(wdt)
            pad_is_zero = False
            cur_h -= 1
        elif kind == "act":
            cur = _act(stage[1], cur)
            if stage[1] == "sigmoid":
                pad_is_zero = False
        elif kind == "glu":
            half = cur.shape[-1] // 2
            cur = _act(stage[1], cur[..., :half]) * cur[..., half:]
        elif kind == "mulsig0":
            w = w_refs[wi][...]
            wi += 1
            b = None
            if stage[2]:
                b = w_refs[wi][...]
                wi += 1
            off = h - cur_h
            R0 = x0.shape[0]
            x0c = x0[off : R0 - off]
            g = _mxu_dot(x0c, w, wdt)
            if b is not None:
                g = g + b[0].astype(wdt)
            cur = cur * _act("sigmoid", g)
        elif kind == "ln":
            g = w_refs[wi][...]
            wi += 1
            bb = w_refs[wi][...]
            wi += 1
            cur = _ln(cur, g, bb, stage[1], wdt)
            pad_is_zero = False  # the LN bias lands on the canvas
        elif kind == "res0":
            off = h - cur_h
            R0 = x0.shape[0]
            x0c = x0[off : R0 - off]
            if stage[1]:
                s = w_refs[wi][...]
                wi += 1
                x0c = x0c * s[0].astype(wdt)
            cur = cur + x0c
        else:
            raise ValueError(kind)

    out_ref[0] = cur.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("spec", "band_h", "interpret")
)
def _fused_band_jit(x, weights, spec, band_h, interpret):
    interpret = _resolve_interpret(interpret)
    B, H, W, C = x.shape
    halo = sum(1 for s in spec if s[0] in ("dense", "dw"))
    tb = band_h
    nb = -(-H // tb)
    Wp = -(-W // 128) * 128
    # pad: one band above/below (vertical halo source), W -> lane multiple.
    x_p = jnp.pad(
        x, ((0, 0), (tb, nb * tb - H + tb), (0, Wp - W), (0, 0))
    )

    cout = C
    wi = 0
    warrs = list(weights)
    for s in spec:
        if s[0] in ("pw", "dense"):
            cout = warrs[wi].shape[-1]
            wi += 1 + (1 if s[2] else 0)
        elif s[0] in ("dw", "mulsig0"):
            wi += 1 + (1 if s[2] else 0)
        elif s[0] == "ln":
            wi += 2
        elif s[0] == "res0":
            wi += 1 if s[1] else 0
        elif s[0] == "glu":
            cout = cout // 2

    grid = (B, nb)

    def band_spec(d):
        return pl.BlockSpec(
            (1, tb, Wp, C), lambda b, i, d=d: (b, i + d, 0, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [band_spec(0), band_spec(1), band_spec(2)]
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    in_specs += [full(w) for w in weights]
    out_spec = pl.BlockSpec(
        (1, tb, Wp, cout), lambda b, i: (b, i, 0, 0),
        memory_space=pltpu.VMEM,
    )

    y = pl.pallas_call(
        functools.partial(
            _band_kernel, stages=spec, halo=halo, tb=tb,
            n_weights=len(weights), H=H, W=W,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, nb * tb, Wp, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*([x_p] * 3), *weights)

    return y[:, :H, :W]


def fused_chain_band(x, stages, band_h=16, interpret=None):
    """Row-band fused chain: same DSL/semantics as fused_chain, 3x lower
    halo read amplification and ~H/band_h grid steps."""
    spec, weights = _normalize_stages(stages)
    return _fused_band_jit(x, weights, spec, band_h, interpret)


# --------------------------------------------------------------------------
# Model-level chain wrappers (used by models/wavemamba.py when
# cfg.conv_impl == 'fused'; parameter dicts are the same pytrees the XLA
# lowering uses, so checkpoints are untouched).


def _wb(p):
    return p["w"], p.get("b")


def _run(x, stages, tile_h, tile_w, band_h):
    """Wrapper dispatch: row-band kernel by default (3x halo amplification
    vs the 2-D tiling's 9x — see fused_chain_band); band_h=None selects the
    2-D tile kernel."""
    if band_h is not None:
        return fused_chain_band(x, stages, band_h=band_h)
    return fused_chain(x, stages, tile_h=tile_h, tile_w=tile_w)


def ffn_chain(p, x, tile_h=8, tile_w=128, band_h=16):
    """LFSS ffn: 1x1 -> dw3x3 -> SimpleGate(gelu) -> 1x1
    (`wavemamba_arch.py:214-231`)."""
    w1, b1 = _wb(p["conv1"])
    wdw, bdw = _wb(p["conv2"])
    w3, b3 = _wb(p["conv3"])
    return _run(x, (
        ("pw", w1[0, 0], b1),
        ("dw", wdw[:, :, 0, :], bdw),
        ("glu", "gelu"),
        ("pw", w3[0, 0], b3),
    ), tile_h, tile_w, band_h)


def lfss_ffn_block(p_ln, p_ffn, skip_scale, x, band_h=16):
    """LFSS second half-block FULLY fused — x*skip + ffn(LN(x)) in one
    kernel (`wavemamba_arch.py:520-527`): LN, both 1x1s, the dw3x3, the
    GELU gate and the scaled residual all between one HBM read and one
    write."""
    w1, b1 = _wb(p_ffn["conv1"])
    wdw, bdw = _wb(p_ffn["conv2"])
    w3, b3 = _wb(p_ffn["conv3"])
    return _run(x, (
        ("ln", p_ln["g"], p_ln["b"], 1e-5),
        ("pw", w1[0, 0], b1),
        ("dw", wdw[:, :, 0, :], bdw),
        ("glu", "gelu"),
        ("pw", w3[0, 0], b3),
        ("res0", skip_scale),
    ), 8, 128, band_h)


def _ln_prefix(ln):
    return () if ln is None else (("ln", ln[0], ln[1], ln[2]),)


def qkv_chain(p, x, tile_h=8, tile_w=128, band_h=16, ln=None):
    """CMT qkv: [LN ->] 1x1 (C->3C) -> dw3x3 (`wavemamba_arch.py:772-776`);
    ln=(g, b, eps) fuses the preceding LayerNorm into the same kernel."""
    wq, bq = _wb(p["qkv"])
    wd, bd = _wb(p["qkv_dwconv"])
    return _run(x, _ln_prefix(ln) + (
        ("pw", wq[0, 0], bq),
        ("dw", wd[:, :, 0, :], bd),
    ), tile_h, tile_w, band_h)


def paconv_chain(p, x, tile_h=8, tile_w=128, band_h=16):
    """PAConv: k4(k3(x) * sigmoid(k2(x))) (`wavemamba_arch.py:640-657`)."""
    w2, b2 = _wb(p["k2"])
    w3, _ = _wb(p["k3"])
    w4, _ = _wb(p["k4"])
    return _run(x, (
        ("dense", w3, None),
        ("mulsig0", w2[0, 0], b2),
        ("dense", w4, None),
    ), tile_h, tile_w, band_h)


def ff_in_chain(p, x, tile_h=8, tile_w=128, band_h=16, ln=None):
    """HFE FeedForward project_in: [LN ->] 1x1 -> dw3x3
    (`wavemamba_arch.py:726-733`)."""
    w1, b1 = _wb(p[0])
    wd, bd = _wb(p[1])
    return _run(x, _ln_prefix(ln) + (
        ("pw", w1[0, 0], b1),
        ("dw", wd[:, :, 0, :], bd),
    ), tile_h, tile_w, band_h)


def ff_out_chain(p, x, tile_h=8, tile_w=128, band_h=16):
    """HFE FeedForward project_out: dw3x3 -> gelu -> 1x1 (`:735-741`)."""
    wd, bd = _wb(p[0])
    w2, b2 = _wb(p[1])
    return _run(x, (
        ("dw", wd[:, :, 0, :], bd),
        ("act", "gelu"),
        ("pw", w2[0, 0], b2),
    ), tile_h, tile_w, band_h)


def restormer_chain(p, x, tile_h=8, tile_w=128, band_h=16, ln=None,
                    residual=False):
    """FeedForward_Restormer: [LN ->] 1x1 -> dw3x3 -> GLU(gelu) -> 1x1
    [-> +x] (`:801-819`); residual=True adds the chain input back (the HFE
    block residual) inside the kernel."""
    w1, b1 = _wb(p["project_in"])
    wd, bd = _wb(p["dwconv"])
    w2, b2 = _wb(p["project_out"])
    stages = _ln_prefix(ln) + (
        ("pw", w1[0, 0], b1),
        ("dw", wd[:, :, 0, :], bd),
        ("glu", "gelu"),
        ("pw", w2[0, 0], b2),
    )
    if residual:
        stages = stages + (("res0", None),)
    return _run(x, stages, tile_h, tile_w, band_h)


def dw_act(p, x, act="silu", tile_h=8, tile_w=128, band_h=16):
    """Depthwise 3x3 + activation (SS2D's conv2d+silu, `:446`)."""
    wd, bd = _wb(p)
    return _run(x, (
        ("dw", wd[:, :, 0, :], bd),
        ("act", act),
    ), tile_h, tile_w, band_h)


def dense3x3(p, x, tile_h=8, tile_w=128, band_h=16):
    """Single dense 3x3 (l_conv / h_out_conv / conv_01 / last)."""
    w, b = _wb(p)
    return _run(x, (("dense", w, b),), tile_h, tile_w, band_h)
