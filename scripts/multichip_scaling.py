"""Quantitative virtual-mesh scaling measurement (VERDICT r2 #6).

Runs the mesh-tiled inference path at realistic tile COUNTS (a 40-tile 8K
frame's batch structure) on 1-, 2-, 4- and 8-device virtual CPU meshes and
reports, for each mesh size:
  * tile-batch arithmetic (tiles per jit call, pad waste for counts not
    divisible by the mesh size),
  * compile time vs per-batch execute time,
  * numerical agreement with the single-device result.

On a single host, CPU "devices" share cores, so wall time does NOT scale —
what this measures is the overhead STRUCTURE (batch padding, collective
insertion, per-call host cost) of the sharded path; chip-count scaling
follows from the absence of cross-tile communication (the jitted module
contains no collectives — asserted below).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python scripts/multichip_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from wavemamba_tpu.models.wavemamba import (
        WaveMambaConfig, init_wavemamba, wavemamba_apply,
    )
    from wavemamba_tpu.models.tiling import tiled_apply_mesh, tiled_apply
    from wavemamba_tpu.parallel.mesh import make_mesh, batch_sharding, replicated

    assert len(jax.devices()) >= 8, "run with an 8-device virtual CPU platform"

    cfg = WaveMambaConfig(wf=16, n_l_blocks=(1, 1, 1), n_h_blocks=(1, 1, 1),
                          scan_chunk=64)
    params = init_wavemamba(jax.random.PRNGKey(0), cfg)

    # A 5x8 tile grid (40 tiles) — the 8K frame's tile-count structure —
    # over a 320x512 image with 64-px tiles.
    img = np.random.RandomState(0).rand(1, 320, 512, 3).astype(np.float32)
    ts, tp = 64, 8

    ref = tiled_apply(
        jax.jit(lambda t: wavemamba_apply(params, cfg, t)), img,
        tile_size=ts, tile_pad=tp,
    )

    print(f"{'mesh':>4} {'tile_batch':>10} {'jit_calls':>9} {'pad_tiles':>9} "
          f"{'compile_s':>9} {'exec_s/call':>11} {'max|d| vs 1dev':>15}")
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        tile_batch = max(n, (8 // n) * n) if n <= 8 else n
        tile_batch = ((tile_batch + n - 1) // n) * n
        n_tiles = 40
        jit_calls = -(-n_tiles // tile_batch)
        pad_tiles = jit_calls * tile_batch - n_tiles

        # compile once, timed
        ext = ts + 2 * tp
        probe = jnp.zeros((tile_batch, ext, ext, 3), jnp.float32)
        fn = jax.jit(
            lambda p, t: wavemamba_apply(p, cfg, t),
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=batch_sharding(mesh),
        )
        t0 = time.time()
        lowered = fn.lower(params, probe)
        compiled = lowered.compile()
        compile_s = time.time() - t0
        # No cross-tile collectives in the sharded module (scaling is
        # embarrassingly parallel over tiles).
        hlo = compiled.as_text()
        assert "all-reduce" not in hlo and "all-gather" not in hlo, \
            "unexpected collective in tiled inference"

        out = np.asarray(compiled(params, probe))  # warm
        t0 = time.time()
        for _ in range(3):
            out = np.asarray(compiled(params, probe))
        exec_s = (time.time() - t0) / 3

        res = tiled_apply_mesh(wavemamba_apply, params, cfg, img, mesh,
                               tile_size=ts, tile_pad=tp)
        d = float(np.max(np.abs(res - ref)))
        print(f"{n:>4} {tile_batch:>10} {jit_calls:>9} {pad_tiles:>9} "
              f"{compile_s:>9.1f} {exec_s:>11.3f} {d:>15.2e}")
        assert d < 3e-5, d

    print("MULTICHIP SCALING OK")


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main()
