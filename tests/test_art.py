"""ART architecture parity vs the reference torch implementation."""

import numpy as np
import pytest

from tests import torch_oracle as oracle
from wavemamba_tpu.convert.torch_import import convert_state_dict
from wavemamba_tpu.models.art import ARTConfig, art_apply, init_art

REF_ART = "/root/reference/basicsr/archs/art_arch.py"

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference repo not mounted"
)


def _build_pair(dim=8, n_blocks=2, num_heads=2, window_size=4, interval=8, up=2, seed=0):
    import torch

    ref = oracle.load_reference_module(REF_ART)
    torch.manual_seed(seed)
    model = ref.ART(
        dim=dim, n_blocks=n_blocks, num_heads=num_heads,
        window_size=window_size, interval=interval, mlp_ratio=2, upscaling_factor=up,
    ).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_state_dict(state)
    cfg = ARTConfig(
        dim=dim, n_blocks=n_blocks, num_heads=num_heads,
        window_size=window_size, interval=interval, mlp_ratio=2, upscaling_factor=up,
    )
    return model, params, cfg


def test_art_forward_parity():
    import torch

    model, params, cfg = _build_pair()
    # 24x16 input -> feature grid 12x8: exercises dense (4|12, 4|8) cleanly
    # and sparse with padding (8 does not divide 12).
    x = np.random.RandomState(0).rand(1, 3, 24, 16).astype(np.float32)
    with torch.no_grad():
        ty = model(torch.from_numpy(x)).numpy()
    y = art_apply(params, cfg, np.transpose(x, (0, 2, 3, 1)))
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y, ty, rtol=1e-3, atol=1e-4)


def test_art_init_tree_matches():
    import jax

    model, params, cfg = _build_pair(seed=1)
    mine = init_art(jax.random.PRNGKey(0), cfg)
    ref_shapes = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    my_shapes = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(mine)[0]
    }
    assert ref_shapes == my_shapes
