"""MobileNetV2 backbone + PoseNetV2 (the reference's non-DFNet APR /
feature branch).

Functional parity: /root/reference/script/feature/model.py:392-452
(PoseNetV2: torchvision mobilenet_v2 features → AdaptiveAvgPool →
Linear(1280, 12); feature tap = block 17's output, stacked single- or
two-stream). Backbone layout matches torchvision mobilenet_v2.features:
  [0]  ConvBNReLU6 3→32 /2
  [1..17] inverted residuals, cfg (t,c,n,s) = (1,16,1,1)(6,24,2,2)
          (6,32,3,2)(6,64,4,2)(6,96,3,1)(6,160,3,2)(6,320,1,1)
  [18] ConvBNReLU6 320→1280
NHWC; BN carries running stats in `state` (train/eval modes like
models/dfnet). Weight conversion from torchvision state_dicts included.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
BN_MOMENTUM = 0.1

INVERTED_RESIDUAL_CFG = [
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


def _conv_init(key, kh, kw, cin, cout, groups=1):
    fan_in = kh * kw * cin // groups
    bound = np.sqrt(6.0 / ((1 + 5) * fan_in))  # kaiming_uniform(a=√5)
    return jax.random.uniform(key, (kh, kw, cin // groups, cout), jnp.float32,
                              -bound, bound)


def _bn_init(c):
    return ({"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def _batchnorm(p, s, x, train: bool):
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        new = {"mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
               "var": (1 - BN_MOMENTUM) * s["var"]
                      + BN_MOMENTUM * var * n / max(n - 1, 1)}
    else:
        mean, var = s["mean"], s["var"]
        new = s
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * p["scale"] + p["bias"]
    return y, new


def _conv(x, w, stride=1, groups=1):
    # explicit symmetric padding k//2 (torch Conv2d padding=1 semantics —
    # NOT XLA "SAME", which pads asymmetrically for stride 2)
    k = w.shape[0]
    pad = [(k // 2, k // 2), (k // 2, k // 2)]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _block_layers(cin: int, cout: int, t: int, stride: int) -> List[Tuple]:
    """Layer spec of one inverted residual: [(kind, kh, cin, cout, stride,
    groups)] with kinds pw-expand / dw / pw-linear."""
    hidden = cin * t
    layers = []
    if t != 1:
        layers.append(("pw", 1, cin, hidden, 1, 1))
    layers.append(("dw", 3, hidden, hidden, stride, hidden))
    layers.append(("pwl", 1, hidden, cout, 1, 1))
    return layers


def mobilenet_v2_structure():
    """[(module_idx, kind, layers, use_residual)] for features[0..18]."""
    blocks = [("conv", [("pw", 3, 3, 32, 2, 1)], False)]
    cin = 32
    for t, c, n, s in INVERTED_RESIDUAL_CFG:
        for i in range(n):
            stride = s if i == 0 else 1
            blocks.append(("ir", _block_layers(cin, c, t, stride),
                           stride == 1 and cin == c))
            cin = c
    blocks.append(("conv", [("pw", 1, cin, 1280, 1, 1)], False))
    return blocks


def init_mobilenet_params(key) -> Tuple[Dict, Dict]:
    params: Dict = {}
    state: Dict = {}
    blocks = mobilenet_v2_structure()
    keys = jax.random.split(key, 64)
    ki = 0
    for bi, (kind, layers, _) in enumerate(blocks):
        bp, bs = [], []
        for (lk, kh, cin, cout, stride, groups) in layers:
            w = _conv_init(keys[ki % 64], kh, kh, cin, cout, groups)
            ki += 1
            bn_p, bn_s = _bn_init(cout)
            bp.append({"w": w, "bn": bn_p})
            bs.append({"bn": bn_s})
        params[str(bi)] = bp
        state[str(bi)] = bs
    return params, state


def mobilenet_features(params: Dict, state: Dict, x: jnp.ndarray,
                       train_bn: bool = False, taps=(17,)):
    """x: (B,H,W,3) ImageNet-normalized. Returns (final (B,h,w,1280),
    {tap_idx: activation}, new_state)."""
    blocks = mobilenet_v2_structure()
    new_state: Dict = {}
    tapped = {}
    for bi, (kind, layers, residual) in enumerate(blocks):
        inp = x
        bs_new = []
        for li, (lk, kh, cin, cout, stride, groups) in enumerate(layers):
            p = params[str(bi)][li]
            s = state[str(bi)][li]
            x = _conv(x, p["w"], stride, groups)
            x, bn_new = _batchnorm(p["bn"], s["bn"], x, train_bn)
            bs_new.append({"bn": bn_new})
            if lk != "pwl":                       # linear bottleneck: no act
                x = jnp.minimum(jax.nn.relu(x), 6.0)
        if residual:
            x = x + inp
        new_state[str(bi)] = bs_new
        if bi in taps:
            tapped[bi] = x
    return x, tapped, new_state


@dataclass(frozen=True)
class PoseNetV2Config:
    feat_dim: int = 12
    tap_block: int = 17


def init_posenetv2_params(key) -> Tuple[Dict, Dict]:
    kb, kf = jax.random.split(key)
    params, state = init_mobilenet_params(kb)
    bound = 1.0 / np.sqrt(1280)
    kw, kb2 = jax.random.split(kf)
    params["fc_pose"] = {
        "w": jax.random.uniform(kw, (1280, 12), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb2, (12,), jnp.float32, -bound, bound),
    }
    return params, state


def posenetv2_forward(params: Dict, state: Dict, x: jnp.ndarray,
                      is_train: bool = False, is_single_stream: bool = False,
                      train_bn: bool = False):
    """Returns (feat_out, predict, new_state). feat_out: [] or a list with
    one (1 or 2, B, h, w, C) stack of block-17 features."""
    from dfnet_tpu.models.vgg import imagenet_normalize

    backbone = {k: v for k, v in params.items() if k != "fc_pose"}
    final, tapped, new_state = mobilenet_features(
        backbone, state, imagenet_normalize(x), train_bn, taps=(17,))
    feat_out = []
    if is_train:
        f = tapped[17]
        if is_single_stream:
            feat_out.append(jnp.stack([f]))
        else:
            b = f.shape[0]
            feat_out.append(jnp.stack([f[: b // 2], f[b // 2:]]))
    pooled = jnp.mean(final, axis=(1, 2))
    predict = pooled @ params["fc_pose"]["w"] + params["fc_pose"]["b"]
    return feat_out, predict, new_state


def convert_mobilenet_v2(sd: Dict) -> Tuple[Dict, Dict]:
    """torchvision mobilenet_v2 state_dict → (params, state) for the
    backbone (features.* keys)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}

    def conv_w(name, groups=1):
        w = sd[f"{name}.weight"]       # (out, in/groups, kh, kw)
        w = w.transpose(2, 3, 1, 0)    # (kh, kw, in/groups, out)
        return jnp.asarray(w)

    def bn(name):
        return ({"scale": jnp.asarray(sd[f"{name}.weight"]),
                 "bias": jnp.asarray(sd[f"{name}.bias"])},
                {"mean": jnp.asarray(sd[f"{name}.running_mean"]),
                 "var": jnp.asarray(sd[f"{name}.running_var"])})

    params: Dict = {}
    state: Dict = {}
    blocks = mobilenet_v2_structure()
    for bi, (kind, layers, _) in enumerate(blocks):
        bp, bs = [], []
        if kind == "conv":
            names = [(f"features.{bi}.0", f"features.{bi}.1")]
        else:
            n = len(layers)
            names = []
            for li in range(n - 1):
                names.append((f"features.{bi}.conv.{li}.0",
                              f"features.{bi}.conv.{li}.1"))
            names.append((f"features.{bi}.conv.{n - 1}",
                          f"features.{bi}.conv.{n}"))
        for (cname, bname), (lk, kh, cin, cout, stride, groups) in zip(names, layers):
            bn_p, bn_s = bn(bname)
            bp.append({"w": conv_w(cname, groups), "bn": bn_p})
            bs.append({"bn": bn_s})
        params[str(bi)] = bp
        state[str(bi)] = bs
    return params, state
