import jax
import jax.numpy as jnp
import numpy as np

from dfnet_tpu.models.efficientnet import (
    EfficientNetAPRConfig, efficientnet_apr_forward, efficientnet_structure,
    init_efficientnet_apr, round_filters, round_repeats,
)


def test_scaling_rules_match_reference_widths():
    # b0: stem 32, final block 320, head 1280; b3: stem 40, head 1536
    stem0, blocks0, last0, head0 = efficientnet_structure("b0")
    assert stem0 == 32 and last0 == 320 and head0 == 1280
    assert len(blocks0) == 16
    stem3, blocks3, last3, head3 = efficientnet_structure("b3")
    assert stem3 == 40 and head3 == 1536
    assert round_filters(32, 1.2) == 40
    assert round_repeats(3, 1.4) == 5


def test_efficientnet_apr_forward():
    cfg = EfficientNetAPRConfig(variant="b0")
    params, state = init_efficientnet_apr(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)),
                    jnp.float32)
    pose, _ = efficientnet_apr_forward(params, state, x, cfg)
    assert pose.shape == (2, 12)
    assert np.isfinite(np.asarray(pose)).all()


# ----------------------------------------------------------------- converter

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class _SamePadConv(nn.Conv2d):
    """Conv2dStaticSamePadding replica: TF SAME (asymmetric) padding,
    as used by efficientnet_pytorch which the reference loads
    (reference: script/feature/efficientnet.py:60, model.py:454)."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        s, k = self.stride[0], self.kernel_size[0]
        ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
        pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class _MBConv(nn.Module):
    def __init__(self, k, cin, cout, stride, expand):
        super().__init__()
        hidden = cin * expand
        if expand != 1:
            self._expand_conv = _SamePadConv(cin, hidden, 1, bias=False)
            self._bn0 = nn.BatchNorm2d(hidden, eps=1e-3, momentum=0.01)
        self._depthwise_conv = _SamePadConv(hidden, hidden, k, stride=stride,
                                            groups=hidden, bias=False)
        self._bn1 = nn.BatchNorm2d(hidden, eps=1e-3, momentum=0.01)
        se_c = max(1, cin // 4)
        self._se_reduce = _SamePadConv(hidden, se_c, 1)
        self._se_expand = _SamePadConv(se_c, hidden, 1)
        self._project_conv = _SamePadConv(hidden, cout, 1, bias=False)
        self._bn2 = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01)
        self.expand, self.stride, self.cin, self.cout = expand, stride, cin, cout

    def forward(self, x):
        inp = x
        if self.expand != 1:
            x = F.silu(self._bn0(self._expand_conv(x)))
        x = F.silu(self._bn1(self._depthwise_conv(x)))
        se = F.adaptive_avg_pool2d(x, 1)
        se = self._se_expand(F.silu(self._se_reduce(se)))
        x = torch.sigmoid(se) * x
        x = self._bn2(self._project_conv(x))
        if self.stride == 1 and self.cin == self.cout:
            x = x + inp
        return x


class _TorchEfficientNet(nn.Module):
    """state_dict-name-compatible replica of lukemelas
    efficientnet_pytorch (the reference's backbone source): _conv_stem/
    _bn0, _blocks.{i}.{_expand_conv,_bn0,_depthwise_conv,_bn1,
    _se_reduce,_se_expand,_project_conv,_bn2}, _conv_head/_bn1."""

    def __init__(self, variant="b0"):
        super().__init__()
        stem_c, blocks, last_c, head_c = efficientnet_structure(variant)
        self._conv_stem = _SamePadConv(3, stem_c, 3, stride=2, bias=False)
        self._bn0 = nn.BatchNorm2d(stem_c, eps=1e-3, momentum=0.01)
        self._blocks = nn.ModuleList([_MBConv(*b) for b in blocks])
        self._conv_head = _SamePadConv(last_c, head_c, 1, bias=False)
        self._bn1 = nn.BatchNorm2d(head_c, eps=1e-3, momentum=0.01)

    def forward(self, x):
        x = F.silu(self._bn0(self._conv_stem(x)))
        for b in self._blocks:
            x = b(x)
        return F.silu(self._bn1(self._conv_head(x)))


def _randomize_bn(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0.0, 0.05, generator=g)


def _converter_parity(variant, hw, atol):
    from dfnet_tpu.models.efficientnet import (
        convert_efficientnet, efficientnet_features)

    torch.manual_seed(3)
    tnet = _TorchEfficientNet(variant).eval()
    _randomize_bn(tnet)
    params, state = convert_efficientnet(tnet.state_dict(), variant)
    # odd spatial dims exercise the asymmetric SAME padding of stride-2 convs
    x = np.random.default_rng(0).uniform(-1, 1, (2, *hw, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    ours, _, _ = efficientnet_features(params, state, jnp.asarray(x), variant)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=atol, rtol=1e-3)


def test_efficientnet_b0_converter_matches_torch_replica():
    _converter_parity("b0", (37, 45), atol=2e-3)


def test_efficientnet_b3_converter_matches_torch_replica():
    _converter_parity("b3", (33, 33), atol=3e-3)
