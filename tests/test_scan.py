import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavemamba_tpu.ops.scan import selective_scan_chunked, selective_scan_ref


def _rand_inputs(key, b=2, k=4, l=37, d=8, n=4):
    ks = jax.random.split(key, 7)
    u = jax.random.normal(ks[0], (b, k, l, d))
    delta = jax.random.normal(ks[1], (b, k, l, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (k, d, n)) * 0.3)
    Bs = jax.random.normal(ks[3], (b, k, l, n))
    Cs = jax.random.normal(ks[4], (b, k, l, n))
    D = jax.random.normal(ks[5], (k, d))
    bias = jax.random.normal(ks[6], (k, d)) * 0.2
    return u, delta, A, Bs, Cs, D, bias


def test_chunked_matches_ref():
    args = _rand_inputs(jax.random.PRNGKey(0))
    y_ref = selective_scan_ref(*args)
    y_chk = selective_scan_chunked(*args, chunk=16)
    np.testing.assert_allclose(np.asarray(y_chk), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def test_chunked_chunk_size_invariance():
    args = _rand_inputs(jax.random.PRNGKey(1), l=50)
    y1 = selective_scan_chunked(*args, chunk=8)
    y2 = selective_scan_chunked(*args, chunk=64)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5, atol=2e-5)


def test_chunked_is_differentiable():
    args = _rand_inputs(jax.random.PRNGKey(2), l=20)

    def loss(u):
        return jnp.sum(selective_scan_chunked(u, *args[1:], chunk=8) ** 2)

    g = jax.grad(loss)(args[0])
    assert np.isfinite(np.asarray(g)).all()

    # Gradient of the chunked impl must match the step-by-step reference.
    def loss_ref(u):
        return jnp.sum(selective_scan_ref(u, *args[1:]) ** 2)

    g_ref = jax.grad(loss_ref)(args[0])
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_matches_torch_oracle():
    """Exact-semantics check vs the mamba_ssm-style torch oracle."""
    from tests import torch_oracle as oracle
    import torch

    b, k, l, d, n = 2, 4, 19, 6, 5
    args = _rand_inputs(jax.random.PRNGKey(3), b=b, k=k, l=l, d=d, n=n)
    u, delta, A, Bs, Cs, D, bias = (np.asarray(a) for a in args)

    # Repack to mamba_ssm layouts: u/delta (b, KD, L); A (KD, N); B/C (b,K,N,L).
    tu = torch.from_numpy(np.transpose(u, (0, 1, 3, 2)).reshape(b, k * d, l))
    tdelta = torch.from_numpy(np.transpose(delta, (0, 1, 3, 2)).reshape(b, k * d, l))
    tA = torch.from_numpy(A.reshape(k * d, n))
    tB = torch.from_numpy(np.transpose(Bs, (0, 1, 3, 2)))
    tC = torch.from_numpy(np.transpose(Cs, (0, 1, 3, 2)))
    tD = torch.from_numpy(D.reshape(k * d))
    tbias = torch.from_numpy(bias.reshape(k * d))

    ty = oracle.selective_scan_torch(
        tu, tdelta, tA, tB, tC, tD, delta_bias=tbias, delta_softplus=True
    ).numpy()
    ty = np.transpose(ty.reshape(b, k, d, l), (0, 1, 3, 2))

    y = selective_scan_ref(*args)
    np.testing.assert_allclose(np.asarray(y), ty, rtol=2e-5, atol=2e-5)
    y2 = selective_scan_chunked(*args, chunk=8)
    np.testing.assert_allclose(np.asarray(y2), ty, rtol=2e-5, atol=2e-5)


def test_par_matches_ref():
    from wavemamba_tpu.ops.scan import selective_scan_par

    args = _rand_inputs(jax.random.PRNGKey(4), l=53)
    y_ref = selective_scan_ref(*args)
    y_par = selective_scan_par(*args, sub=8)
    np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def test_par_is_differentiable_and_matches_ref_grad():
    from wavemamba_tpu.ops.scan import selective_scan_par

    args = _rand_inputs(jax.random.PRNGKey(5), l=24)

    def loss_par(u):
        return jnp.sum(selective_scan_par(u, *args[1:], sub=4) ** 2)

    def loss_ref(u):
        return jnp.sum(selective_scan_ref(u, *args[1:]) ** 2)

    g_par = jax.grad(loss_par)(args[0])
    g_ref = jax.grad(loss_ref)(args[0])
    np.testing.assert_allclose(np.asarray(g_par), np.asarray(g_ref), rtol=1e-4, atol=1e-4)
