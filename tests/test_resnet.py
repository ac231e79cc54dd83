"""ResNet34 backbone parity vs a torchvision-structured torch replica,
plus legacy PoseNet/MapNet head shapes."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax
import jax.numpy as jnp

from dfnet_tpu.models.resnet import (
    LegacyPoseNetConfig, RESNET34_STAGES, init_legacy_posenet,
    init_resnet34_params, legacy_posenet_forward, mapnet_forward,
    resnet34_features,
)

torch.manual_seed(0)


class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                                      nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = self.down(x) if self.down is not None else x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class _TorchResNet34(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        stages = []
        for n, c, s in RESNET34_STAGES:
            blocks = []
            for i in range(n):
                blocks.append(_BasicBlock(cin if i == 0 else c, c,
                                          s if i == 0 else 1))
            stages.append(nn.Sequential(*blocks))
            cin = c
        self.layers = nn.ModuleList(stages)

    def forward(self, x):
        h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for stage in self.layers:
            h = stage(h)
        return h.mean((2, 3))


def _convert(tnet):
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}

    def conv(name):
        return jnp.asarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))

    def bn(name):
        return ({"scale": jnp.asarray(sd[f"{name}.weight"]),
                 "bias": jnp.asarray(sd[f"{name}.bias"])},
                {"mean": jnp.asarray(sd[f"{name}.running_mean"]),
                 "var": jnp.asarray(sd[f"{name}.running_var"])})

    params = {"stem": {"w": conv("conv1")}}
    state = {}
    params["stem"]["bn"], s = bn("bn1")
    state["stem"] = {"bn": s}
    for si, (n, c, stride) in enumerate(RESNET34_STAGES):
        for bi in range(n):
            base = f"layers.{si}.{bi}"
            name = f"layer{si + 1}_{bi}"
            bp = {"conv1": {"w": conv(f"{base}.conv1")},
                  "conv2": {"w": conv(f"{base}.conv2")}}
            bs = {}
            bp["conv1"]["bn"], bs["bn1"] = bn(f"{base}.bn1")
            bp["conv2"]["bn"], bs["bn2"] = bn(f"{base}.bn2")
            if f"{base}.down.0.weight" in sd:
                bp["down"] = {"w": conv(f"{base}.down.0")}
                bp["down"]["bn"], bs["bn_down"] = bn(f"{base}.down.1")
            params[name] = bp
            state[name] = bs
    return params, state


def test_resnet34_features_match_torch():
    tnet = _TorchResNet34().eval()
    params, state = _convert(tnet)
    x = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        ref = tnet(x).numpy()
    got, _ = resnet34_features(params, state,
                               jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)


def test_legacy_posenet_and_mapnet_shapes():
    cfg = LegacyPoseNetConfig(feat_dim=64)
    params, state = init_legacy_posenet(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((2, 64, 64, 3)) * 0.4
    pose, _ = legacy_posenet_forward(params, state, x, cfg)
    assert pose.shape == (2, 12)

    cfg6 = LegacyPoseNetConfig(feat_dim=64, mapnet_heads=True)
    params6, state6 = init_legacy_posenet(jax.random.PRNGKey(1), cfg6)
    pose6, _ = legacy_posenet_forward(params6, state6, x, cfg6)
    assert pose6.shape == (2, 6)

    seq = jnp.ones((2, 3, 64, 64, 3)) * 0.4
    poses, _ = mapnet_forward(params6, state6, seq, cfg6)
    assert poses.shape == (2, 3, 6)
