"""Band-kernel sweep vs XLA chains at 540p on the real chip (r3)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from wavemamba_tpu.experimental import conv_fused as cf
from wavemamba_tpu.ops.nn import conv2d, init_conv2d, silu


def fence(x):
    return float(jnp.asarray(x).ravel()[0])


def t_it(f, *a, iters=10):
    fence(f(*a)); fence(f(*a))
    t0 = time.time()
    for _ in range(iters):
        y = f(*a)
    fence(y)
    return (time.time() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    C = 32
    x = jnp.asarray(np.random.RandomState(0).rand(1, 544, 960, C), jnp.bfloat16)
    x64 = jnp.asarray(np.random.RandomState(1).rand(1, 544, 960, 64), jnp.bfloat16)

    # dw+silu at d_inner=64 (SS2D conv)
    pdw = init_conv2d(jax.random.PRNGKey(4), 3, 3, 64, 64, groups=64)
    xla_dw = jax.jit(lambda t: silu(conv2d(pdw, t, padding=1, groups=64)))
    print(f"xla dw+silu  : {t_it(xla_dw, x64)*1e3:.3f} ms", flush=True)
    ref = np.asarray(xla_dw(x64), np.float32)
    for bh in [8, 16, 32, 64]:
        try:
            f = jax.jit(lambda t, bh=bh: cf.dw_act(pdw, t, "silu", band_h=bh))
            got = np.asarray(f(x64), np.float32)
            err = np.abs(got - ref).max()
            dt = t_it(f, x64)
            print(f"band dw+silu bh={bh:>3}: {dt*1e3:7.3f} ms  max|d| {err:.4f}", flush=True)
        except Exception as e:
            print(f"band dw+silu bh={bh:>3}: FAIL {type(e).__name__} {str(e)[:140]}", flush=True)

    # ffn chain (pw->dw->glu->pw) at model C
    from wavemamba_tpu.models.wavemamba import init_ffn, ffn_apply
    pf = init_ffn(jax.random.PRNGKey(3), C)
    xla_ffn = jax.jit(lambda t: ffn_apply(pf, t))
    print(f"xla ffn chain: {t_it(xla_ffn, x)*1e3:.3f} ms", flush=True)
    for bh in [8, 16, 32]:
        try:
            f = jax.jit(lambda t, bh=bh: cf.ffn_chain(pf, t, band_h=bh))
            dt = t_it(f, x)
            print(f"band ffn bh={bh:>3}: {dt*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"band ffn bh={bh:>3}: FAIL {type(e).__name__} {str(e)[:140]}", flush=True)

    # qkv chain
    p = {
        "qkv": init_conv2d(jax.random.PRNGKey(0), 1, 1, C, 3 * C),
        "qkv_dwconv": init_conv2d(jax.random.PRNGKey(1), 3, 3, 3 * C, 3 * C, groups=3 * C),
    }
    xla = jax.jit(lambda t: conv2d(p["qkv_dwconv"], conv2d(p["qkv"], t),
                                   padding=1, groups=3 * C))
    print(f"xla qkv chain: {t_it(xla, x)*1e3:.3f} ms", flush=True)
    for bh in [8, 16, 32]:
        try:
            f = jax.jit(lambda t, bh=bh: cf.qkv_chain(p, t, band_h=bh))
            dt = t_it(f, x)
            print(f"band qkv bh={bh:>3}: {dt*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"band qkv bh={bh:>3}: FAIL {type(e).__name__} {str(e)[:140]}", flush=True)

    # fully-fused LFSS ffn half-block (ln + ffn + residual)
    from wavemamba_tpu.models.wavemamba import ffn_apply as ffn_apply2
    from wavemamba_tpu.ops.nn import init_layer_norm, layer_norm
    p_ln = init_layer_norm(C)
    skip = jnp.ones((C,), jnp.float32)
    xla_blk = jax.jit(lambda t: t * skip.astype(t.dtype)
                      + ffn_apply2(pf, layer_norm(p_ln, t, eps=1e-5)))
    print(f"xla lfss half-block: {t_it(xla_blk, x)*1e3:.3f} ms", flush=True)
    for bh in [8, 16, 32]:
        try:
            f = jax.jit(lambda t, bh=bh: cf.lfss_ffn_block(p_ln, pf, skip, t, band_h=bh))
            dt = t_it(f, x)
            print(f"band lfss-blk bh={bh:>3}: {dt*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"band lfss-blk bh={bh:>3}: FAIL {type(e).__name__} {str(e)[:140]}", flush=True)

    # full model forward fused vs default fast() @1080p
    from wavemamba_tpu.models.wavemamba import WaveMambaConfig, init_wavemamba, wavemamba_apply
    import dataclasses
    cfg = WaveMambaConfig.fast()
    params = init_wavemamba(jax.random.PRNGKey(0), cfg)
    xx = jnp.asarray(np.random.RandomState(2).rand(1, 1088, 1920, 3), jnp.float32)
    f0 = jax.jit(lambda pp, t: wavemamba_apply(pp, cfg, t))
    print(f"fast() 1080p: {t_it(f0, params, xx, iters=5)*1e3:.1f} ms", flush=True)
    cfg_f = dataclasses.replace(cfg, conv_impl="fused")
    f1 = jax.jit(lambda pp, t: wavemamba_apply(pp, cfg_f, t))
    try:
        print(f"fast()+fused-chains 1080p: {t_it(f1, params, xx, iters=5)*1e3:.1f} ms", flush=True)
    except Exception as e:
        print(f"fused-chains 1080p FAIL: {type(e).__name__} {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
