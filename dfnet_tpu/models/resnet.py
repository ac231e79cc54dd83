"""ResNet34 backbone + the legacy APR heads (PoseNet_res34, MapNet-style
PoseNet, MapNet sequence wrapper, and the legacy train/eval loops'
models).

Functional parity: /root/reference/script/dm/pose_model.py:212-330 —
torchvision resnet34 with the final fc replaced by Linear(512, feat_dim),
ReLU + dropout, then either a 12-dim pose head (PoseNet_res34) or split
xyz / log-quaternion heads (MapNet-style PoseNet); MapNet flattens an
(N, T, H, W, 3) sequence through the base model. NHWC, BN with running
stats in `state`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
BN_MOMENTUM = 0.1

# resnet34 layout: (blocks, channels, first stride) per stage
RESNET34_STAGES = [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]


def _kaiming_normal(key, kh, kw, cin, cout):
    fan_out = kh * kw * cout
    std = np.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)


def _bn_init(c):
    return ({"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def _conv(x, w, stride=1):
    k = w.shape[0]
    pad = [(k // 2, k // 2), (k // 2, k // 2)]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(p, s, x, train):
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
    return (x - mean) * jax.lax.rsqrt(var + BN_EPS) * p["scale"] + p["bias"], new


def init_resnet34_params(key) -> Tuple[Dict, Dict]:
    keys = iter(jax.random.split(key, 64))
    params: Dict = {"stem": {"w": _kaiming_normal(next(keys), 7, 7, 3, 64)}}
    state: Dict = {}
    bn_p, bn_s = _bn_init(64)
    params["stem"]["bn"] = bn_p
    state["stem"] = {"bn": bn_s}
    cin = 64
    for si, (n_blocks, c, stride) in enumerate(RESNET34_STAGES):
        for bi in range(n_blocks):
            s = stride if bi == 0 else 1
            name = f"layer{si + 1}_{bi}"
            bp: Dict = {
                "conv1": {"w": _kaiming_normal(next(keys), 3, 3, cin if bi == 0 else c, c)},
                "conv2": {"w": _kaiming_normal(next(keys), 3, 3, c, c)},
            }
            bs: Dict = {}
            bp["conv1"]["bn"], bs["bn1"] = _bn_init(c)
            bp["conv2"]["bn"], bs["bn2"] = _bn_init(c)
            if s != 1 or (bi == 0 and cin != c):
                bp["down"] = {"w": _kaiming_normal(next(keys), 1, 1, cin if bi == 0 else c, c)}
                bp["down"]["bn"], bs["bn_down"] = _bn_init(c)
            params[name] = bp
            state[name] = bs
        cin = c
    return params, state


def resnet34_features(params, state, x, train_bn=False):
    """x: (B,H,W,3) normalized → pooled (B,512), new_state."""
    new_state: Dict = {}
    h = _conv(x, params["stem"]["w"], stride=2)
    h, ns = _bn(params["stem"]["bn"], state["stem"]["bn"], h, train_bn)
    new_state["stem"] = {"bn": ns}
    h = jax.nn.relu(h)
    # 3x3 maxpool stride 2, padding 1
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    for si, (n_blocks, c, stride) in enumerate(RESNET34_STAGES):
        for bi in range(n_blocks):
            s = stride if bi == 0 else 1
            name = f"layer{si + 1}_{bi}"
            bp, bs = params[name], state[name]
            ns: Dict = {}
            identity = h
            y = _conv(h, bp["conv1"]["w"], s)
            y, ns["bn1"] = _bn(bp["conv1"]["bn"], bs["bn1"], y, train_bn)
            y = jax.nn.relu(y)
            y = _conv(y, bp["conv2"]["w"], 1)
            y, ns["bn2"] = _bn(bp["conv2"]["bn"], bs["bn2"], y, train_bn)
            if "down" in bp:
                identity = _conv(h, bp["down"]["w"], s)
                identity, ns["bn_down"] = _bn(bp["down"]["bn"], bs["bn_down"],
                                              identity, train_bn)
            h = jax.nn.relu(y + identity)
            new_state[name] = ns
    return jnp.mean(h, axis=(1, 2)), new_state


@dataclass(frozen=True)
class LegacyPoseNetConfig:
    feat_dim: int = 2048
    droprate: float = 0.5
    mapnet_heads: bool = False   # True: split fc_xyz / fc_wpqr (6-dim out)


def init_legacy_posenet(key, cfg: LegacyPoseNetConfig = LegacyPoseNetConfig()):
    kb, k1, k2, k3 = jax.random.split(key, 4)
    params, state = init_resnet34_params(kb)

    def lin(k, fin, fout):
        std = np.sqrt(2.0 / fin)   # kaiming_normal on Linear weights
        kw, _ = jax.random.split(k)
        return {"w": std * jax.random.normal(kw, (fin, fout), jnp.float32),
                "b": jnp.zeros((fout,), jnp.float32)}

    params["fc_feat"] = lin(k1, 512, cfg.feat_dim)
    if cfg.mapnet_heads:
        params["fc_xyz"] = lin(k2, cfg.feat_dim, 3)
        params["fc_wpqr"] = lin(k3, cfg.feat_dim, 3)
    else:
        params["fc_pose"] = lin(k2, cfg.feat_dim, 12)
    return params, state


def legacy_posenet_forward(params, state, x, cfg: LegacyPoseNetConfig,
                           rng=None, train: bool = False):
    """PoseNet_res34 / MapNet-style PoseNet forward. x: (B,H,W,3)."""
    from dfnet_tpu.models.vgg import imagenet_normalize

    backbone = {k: v for k, v in params.items() if not k.startswith("fc")}
    feat, new_state = resnet34_features(backbone, state,
                                        imagenet_normalize(x), train)
    h = jax.nn.relu(feat @ params["fc_feat"]["w"] + params["fc_feat"]["b"])
    if train and cfg.droprate > 0 and rng is not None:
        keep = 1.0 - cfg.droprate
        mask = jax.random.bernoulli(rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    if cfg.mapnet_heads:
        xyz = h @ params["fc_xyz"]["w"] + params["fc_xyz"]["b"]
        wpqr = h @ params["fc_wpqr"]["w"] + params["fc_wpqr"]["b"]
        return jnp.concatenate([xyz, wpqr], -1), new_state
    return h @ params["fc_pose"]["w"] + params["fc_pose"]["b"], new_state


def mapnet_forward(params, state, x_seq, cfg: LegacyPoseNetConfig,
                   rng=None, train: bool = False):
    """MapNet sequence wrapper: (N, T, H, W, 3) → (N, T, out_dim)."""
    n, t = x_seq.shape[:2]
    flat = x_seq.reshape((n * t,) + x_seq.shape[2:])
    poses, new_state = legacy_posenet_forward(params, state, flat, cfg, rng, train)
    return poses.reshape(n, t, -1), new_state
