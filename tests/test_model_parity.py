"""End-to-end numerical parity vs the reference PyTorch model (test oracle).

Builds the reference WaveMamba with random torch init, converts its
state_dict with `convert_state_dict`, and checks the JAX forward matches the
torch forward on random inputs. This validates every block's math AND the
checkpoint converter in one shot (SURVEY.md §7 milestone 1).
"""

import numpy as np
import pytest

from tests import torch_oracle as oracle
from wavemamba_tpu.convert.torch_import import convert_state_dict
from wavemamba_tpu.models.wavemamba import (
    WaveMambaConfig,
    init_wavemamba,
    param_count,
    wavemamba_apply,
)

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference repo not mounted"
)


def _build_pair(wf=16, n_l=(1, 1, 1), n_h=(1, 1, 1), seed=0):
    import torch

    ref = oracle.load_reference_arch()
    torch.manual_seed(seed)
    model = ref.WaveMamba(
        in_chn=3, wf=wf, n_l_blocks=list(n_l), n_h_blocks=list(n_h), ffn_scale=2.0
    ).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_state_dict(state)
    cfg = WaveMambaConfig(in_chn=3, wf=wf, n_l_blocks=n_l, n_h_blocks=n_h, scan_chunk=32)
    return model, params, cfg


def test_forward_parity_small():
    import torch

    model, params, cfg = _build_pair()
    x = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ty = model(torch.from_numpy(x)).numpy()
    y = wavemamba_apply(params, cfg, np.transpose(x, (0, 2, 3, 1)))
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y, ty, rtol=1e-3, atol=2e-4)


def test_forward_parity_rect_batch():
    import torch

    model, params, cfg = _build_pair(seed=1)
    x = np.random.RandomState(1).rand(2, 3, 24, 40).astype(np.float32)
    with torch.no_grad():
        ty = model(torch.from_numpy(x)).numpy()
    y = wavemamba_apply(params, cfg, np.transpose(x, (0, 2, 3, 1)))
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y, ty, rtol=1e-3, atol=2e-4)


def test_init_tree_matches_converted_tree():
    """Our random init must produce the same pytree structure/shapes as a
    converted torch checkpoint — guards checkpoint/optimizer compatibility."""
    import jax

    model, params, cfg = _build_pair()
    mine = init_wavemamba(jax.random.PRNGKey(0), cfg)
    ref_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    my_paths = jax.tree_util.tree_flatten_with_path(mine)[0]
    ref_shapes = {jax.tree_util.keystr(p): v.shape for p, v in ref_paths}
    my_shapes = {jax.tree_util.keystr(p): v.shape for p, v in my_paths}
    assert ref_shapes == my_shapes
    assert param_count(mine) == sum(p.numel() for p in model.parameters())


def test_shipped_config_param_count():
    """Exact parity with the reference model's parameter counts: shipped
    [1,2,4]/[1,1,2] wf=32 -> 1,512,718; the paper-table [1,1,1] variant
    -> 1,258,636 (the '1.258M' in Figures/Fig2.png)."""
    import jax

    n = param_count(init_wavemamba(jax.random.PRNGKey(0), WaveMambaConfig()))
    assert n == 1512718, n
    n2 = param_count(
        init_wavemamba(jax.random.PRNGKey(0), WaveMambaConfig(n_h_blocks=(1, 1, 1)))
    )
    assert n2 == 1258636, n2
