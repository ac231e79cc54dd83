"""MobileNetV2 / PoseNetV2 parity vs a torchvision-structured torch replica."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax
import jax.numpy as jnp

from dfnet_tpu.models.mobilenet import (
    INVERTED_RESIDUAL_CFG, convert_mobilenet_v2, init_posenetv2_params,
    mobilenet_features, posenetv2_forward,
)

torch.manual_seed(0)


def _conv_bn_relu(cin, cout, k, s, groups=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, s, padding=k // 2, groups=groups, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU6(inplace=False))


class _InvertedResidual(nn.Module):
    def __init__(self, cin, cout, stride, t):
        super().__init__()
        hidden = cin * t
        self.use_res = stride == 1 and cin == cout
        layers = []
        if t != 1:
            layers.append(_conv_bn_relu(cin, hidden, 1, 1))
        layers.append(_conv_bn_relu(hidden, hidden, 3, stride, groups=hidden))
        layers.append(nn.Conv2d(hidden, cout, 1, 1, bias=False))
        layers.append(nn.BatchNorm2d(cout))
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        out = self.conv(x)
        return x + out if self.use_res else out


def _torch_mobilenet_v2_features():
    feats = [_conv_bn_relu(3, 32, 3, 2)]
    cin = 32
    for t, c, n, s in INVERTED_RESIDUAL_CFG:
        for i in range(n):
            feats.append(_InvertedResidual(cin, c, s if i == 0 else 1, t))
            cin = c
    feats.append(_conv_bn_relu(cin, 1280, 1, 1))
    return nn.Sequential(*feats)


def test_mobilenet_features_match_torch_replica():
    tnet = _torch_mobilenet_v2_features().eval()
    sd = {f"features.{k}": v for k, v in tnet.state_dict().items()}
    params, state = convert_mobilenet_v2(sd)

    x = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        ref = tnet(x)
        tap17 = None
        h = x
        for i, m in enumerate(tnet):
            h = m(h)
            if i == 17:
                tap17 = h.clone()

    final, tapped, _ = mobilenet_features(
        params, state, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(
        np.asarray(final), ref.permute(0, 2, 3, 1).numpy(), atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(tapped[17]), tap17.permute(0, 2, 3, 1).numpy(), atol=3e-4)


def test_posenetv2_forward_shapes():
    params, state = init_posenetv2_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 64, 64, 3)),
                    jnp.float32)
    feats, pose, _ = posenetv2_forward(params, state, x, is_train=True,
                                       is_single_stream=False)
    assert pose.shape == (4, 12)
    assert len(feats) == 1
    assert feats[0].shape[0] == 2 and feats[0].shape[1] == 2  # two streams, B=2
    feats_s, pose_s, _ = posenetv2_forward(params, state, x, is_train=True,
                                           is_single_stream=True)
    assert feats_s[0].shape[0] == 1 and feats_s[0].shape[1] == 4
