"""Sequence-sharded scan over an 8-virtual-device mesh vs the single-device
scan (exactness of the mesh-level two-pass carry handoff)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from wavemamba_tpu.ops.scan import selective_scan_chunked, selective_scan_ref
from wavemamba_tpu.parallel.mesh import make_mesh
from wavemamba_tpu.parallel.seq_scan import selective_scan_seq_sharded

from tests.test_scan import _rand_inputs


def test_seq_sharded_matches_single_device():
    args = _rand_inputs(jax.random.PRNGKey(0), b=2, k=2, l=256, d=8, n=4)
    mesh = make_mesh(8)
    y_mesh = selective_scan_seq_sharded(*args, mesh=mesh, chunk=16)
    y_ref = selective_scan_ref(*args)
    np.testing.assert_allclose(np.asarray(y_mesh), np.asarray(y_ref),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.slow  # compile-heavy; contract also covered in dryrun phase 3
def test_seq_sharded_reachable_from_model_config():
    """VERDICT r2 #6: scan_impl='seq_sharded' wired into SS2D — the full
    WaveMamba forward over an 8-device mesh must match the single-device
    chunked path at model shapes (incl. the L-padding for non-divisible
    token counts: 24x24 -> L=576 -> padded to 8-divisible)."""
    from wavemamba_tpu.models.wavemamba import (
        WaveMambaConfig,
        init_wavemamba,
        wavemamba_apply,
    )

    mesh = make_mesh(8)
    base = dict(wf=16, n_l_blocks=(1, 1, 1), n_h_blocks=(1, 1, 1), scan_chunk=8)
    cfg_one = WaveMambaConfig(scan_impl="chunked", **base)
    cfg_mesh = WaveMambaConfig(scan_impl="seq_sharded", scan_mesh=mesh, **base)
    params = init_wavemamba(jax.random.PRNGKey(0), cfg_one)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 48, 48, 3), jnp.float32)
    y_one = wavemamba_apply(params, cfg_one, x)
    y_mesh = wavemamba_apply(params, cfg_mesh, x)
    np.testing.assert_allclose(np.asarray(y_mesh), np.asarray(y_one),
                               rtol=3e-5, atol=3e-5)


def test_seq_sharded_long_state_dependence():
    """A decay near 1 makes h depend on tokens many shards back — the carry
    handoff must propagate across every shard boundary."""
    u, delta, A, Bs, Cs, D_skip, delta_bias = _rand_inputs(
        jax.random.PRNGKey(1), b=1, k=1, l=512, d=4, n=2
    )
    A = -jnp.abs(A) * 0.01  # slow decay: long memory
    mesh = make_mesh(8)
    y_mesh = selective_scan_seq_sharded(u, delta, A, Bs, Cs, D_skip,
                                        delta_bias, mesh=mesh, chunk=32)
    y_one = selective_scan_chunked(u, delta, A, Bs, Cs, D_skip, delta_bias,
                                   chunk=32)
    np.testing.assert_allclose(np.asarray(y_mesh), np.asarray(y_one),
                               rtol=3e-5, atol=3e-5)
