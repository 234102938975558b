"""Bucketed static-shape inference (VERDICT r2 #9 / SURVEY §7.4): a folder
of mixed image sizes must compile once per BUCKET, not once per distinct
padded shape — every extra compile is minutes through a tunneled device."""

import os

import cv2
import numpy as np
import pytest


from inference import _BucketLadder, pad_to_shape


def test_bucket_ladder_reuse_and_waste_cap():
    l = _BucketLadder()
    assert l.shape_for(40, 48) == (128, 128)
    assert l.shape_for(100, 90) == (128, 128)  # reused
    assert l.shape_for(200, 150) == (256, 256)  # new bucket
    assert l.shape_for(130, 130) == (256, 256)  # fits within waste cap
    assert l.shape_for(1080, 1920) == (1152, 1920)
    assert l.shape_for(1000, 1900) == (1152, 1920)  # reused
    assert l.buckets == [(128, 128), (256, 256), (1152, 1920)]
    # Waste cap: a tiny image must NOT ride a huge bucket.
    assert l.shape_for(8, 8) == (128, 128)


def test_pad_to_shape_reflect():
    x = np.arange(2 * 5 * 4 * 1, dtype=np.float32).reshape(1, 5, 4, 2)
    y = pad_to_shape(x, 16, 8)
    assert y.shape == (1, 16, 8, 2)
    np.testing.assert_array_equal(y[:, :5, :4], x)
    np.testing.assert_array_equal(y[0, 5, :4], x[0, 3, :4])  # reflected row


@pytest.mark.slow  # compile-heavy; full tier
def test_inference_cli_compiles_once_per_bucket(tmp_path, capsys):
    import jax

    from wavemamba_tpu.models.wavemamba import WaveMambaConfig, init_wavemamba
    from wavemamba_tpu.train.checkpoint import save_network

    cfg = WaveMambaConfig(wf=8, n_l_blocks=(1, 1, 1), n_h_blocks=(1, 1, 1),
                          scan_chunk=16)
    params = init_wavemamba(jax.random.PRNGKey(0), cfg)
    models_dir = tmp_path / "models"
    save_network(params, str(models_dir), "net_g", 1)

    # Three images, three distinct sizes, TWO buckets (128x128 and 256x256).
    in_dir = tmp_path / "lq"
    os.makedirs(in_dir)
    rs = np.random.RandomState(0)
    for name, (h, w) in [("a.png", (40, 48)), ("b.png", (100, 90)),
                         ("c.png", (200, 150))]:
        cv2.imwrite(str(in_dir / name), rs.randint(0, 255, (h, w, 3), np.uint8))

    from inference import main as infer_main

    out_dir = tmp_path / "out"
    infer_main([
        "-i", str(in_dir), "-w", str(models_dir / "net_g_1"),
        "-o", str(out_dir),
        "--wf", "8", "--n_l_blocks", "1", "1", "1",
        "--n_h_blocks", "1", "1", "1",
    ])
    out = capsys.readouterr().out
    assert len(list(out_dir.iterdir())) == 3
    # Output sizes must equal input sizes (crop back from the bucket).
    assert cv2.imread(str(out_dir / "a.png")).shape == (40, 48, 3)
    assert cv2.imread(str(out_dir / "c.png")).shape == (200, 150, 3)
    line = [ln for ln in out.splitlines() if ln.startswith("jit compiles:")]
    assert line, out
    assert line[0].startswith("jit compiles: 2 (buckets: 2)"), line[0]


@pytest.mark.slow  # compile-heavy; contract also covered in fast tier/dryrun
def test_runner_test_compiles_once_per_bucket(tmp_path):
    """The runner/test-pipeline path shares the bucket ladder (`val:
    bucket: true`): a mixed-size val folder jits once per BUCKET, not
    once per distinct padded shape (VERDICT r3 #6)."""
    import numpy as np

    from wavemamba_tpu.runner import RestorationModel

    opt = {
        "name": "unit",
        "model_type": "FeMaSRModel",
        "manual_seed": 0,
        "is_train": False,
        "network_g": {"type": "WaveMamba", "in_chn": 3, "wf": 8,
                      "n_l_blocks": [1, 1, 1], "n_h_blocks": [1, 1, 1],
                      "ffn_scale": 2.0, "scan_chunk": 16},
        "path": {"visualization": str(tmp_path / "vis")},
        "val": {"bucket": True},
    }
    model = RestorationModel(opt)
    rs = np.random.RandomState(0)
    outs = []
    for h, w in [(40, 48), (100, 90), (200, 150)]:  # 2 buckets (128^2, 256^2)
        out = model.test(rs.rand(1, h, w, 3).astype(np.float32))
        assert out.shape == (1, h, w, 3)
        outs.append(out)
    assert len(model._eval_fns) == 2, list(model._eval_fns)
    assert model._bucket_ladder.buckets == [(128, 128), (256, 256)]

    # Default (no `bucket` key): exact per-image padding, one jit per shape.
    opt2 = dict(opt, val={})
    model2 = RestorationModel(opt2)
    for h, w in [(40, 48), (100, 90)]:
        model2.test(rs.rand(1, h, w, 3).astype(np.float32))
    assert model2._bucket_ladder is None
    assert len(model2._eval_fns) == 2
