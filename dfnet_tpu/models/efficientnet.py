"""EfficientNet-B0/B3 backbones + the reference's EfficientNet APR /
feature variants.

Functional parity targets:
  - /root/reference/script/feature/model.py:454-509 and
    script/dm/pose_model.py:193-210 (EfficientNetB3: extract_features →
    AdaptiveAvgPool → Linear(1536→12); B0 head is 1280);
  - /root/reference/script/feature/efficientnet.py (DFNet variant with
    endpoint hypercolumn taps; experimental in the reference — its
    forward even contains a stray pdb.set_trace).

Standard EfficientNet: MBConv blocks with expansion, depthwise conv,
squeeze-excitation, SiLU (swish); width/depth scaling with divisor-8
rounding. NHWC; BN running stats in `state`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3          # EfficientNet uses bn eps 1e-3
BN_MOMENTUM = 0.01

# (expand, channels, repeats, stride, kernel) — B0 baseline
BASE_BLOCKS = [
    (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5), (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3),
]

SCALING = {"b0": (1.0, 1.0), "b3": (1.2, 1.4)}  # (width, depth)
HEAD_DIM = {"b0": 1280, "b3": 1536}


def round_filters(c: int, width: float, divisor: int = 8) -> int:
    c *= width
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(depth * r))


def efficientnet_structure(variant: str = "b0"):
    """[(kind, kernel, cin, cout, stride, expand)] flat block list plus
    stem/head channel counts."""
    width, depth = SCALING[variant]
    stem_c = round_filters(32, width)
    blocks = []
    cin = stem_c
    for expand, c, repeats, stride, k in BASE_BLOCKS:
        cout = round_filters(c, width)
        for i in range(round_repeats(repeats, depth)):
            blocks.append((k, cin, cout, stride if i == 0 else 1, expand))
            cin = cout
    head_c = round_filters(HEAD_DIM[variant], width) if variant == "b0" else HEAD_DIM[variant]
    return stem_c, blocks, cin, head_c


def _conv_init(key, kh, kw, cin, cout, groups=1):
    fan_out = kh * kw * cout // groups
    std = np.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, (kh, kw, cin // groups, cout), jnp.float32)


def _bn_init(c):
    return ({"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def _conv(x, w, stride=1, groups=1):
    # TF-style SAME padding (asymmetric for stride>1 on even inputs) —
    # matches efficientnet_pytorch's Conv2dStaticSamePadding, which the
    # reference's backbones load (script/feature/efficientnet.py)
    k = w.shape[0]

    def same(size):
        out = -(-size // stride)
        total = max((out - 1) * stride + k - size, 0)
        return (total // 2, total - total // 2)

    pad = [same(x.shape[1]), same(x.shape[2])]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, feature_group_count=groups,
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


def init_efficientnet_params(key, variant: str = "b0") -> Tuple[Dict, Dict]:
    stem_c, blocks, last_c, head_c = efficientnet_structure(variant)
    keys = iter(jax.random.split(key, 8 * len(blocks) + 8))
    params: Dict = {"stem": {"w": _conv_init(next(keys), 3, 3, 3, stem_c)}}
    state: Dict = {}
    params["stem"]["bn"], bs = _bn_init(stem_c)
    state["stem"] = {"bn": bs}
    for bi, (k, cin, cout, stride, expand) in enumerate(blocks):
        hidden = cin * expand
        bp: Dict = {}
        bst: Dict = {}
        if expand != 1:
            bp["expand"] = {"w": _conv_init(next(keys), 1, 1, cin, hidden)}
            bp["expand"]["bn"], bst["bn_e"] = _bn_init(hidden)
        bp["dw"] = {"w": _conv_init(next(keys), k, k, hidden, hidden, groups=hidden)}
        bp["dw"]["bn"], bst["bn_d"] = _bn_init(hidden)
        se_c = max(1, cin // 4)
        bp["se_reduce"] = {"w": _conv_init(next(keys), 1, 1, hidden, se_c),
                           "b": jnp.zeros((se_c,))}
        bp["se_expand"] = {"w": _conv_init(next(keys), 1, 1, se_c, hidden),
                           "b": jnp.zeros((hidden,))}
        bp["project"] = {"w": _conv_init(next(keys), 1, 1, hidden, cout)}
        bp["project"]["bn"], bst["bn_p"] = _bn_init(cout)
        params[f"block{bi}"] = bp
        state[f"block{bi}"] = bst
    params["head"] = {"w": _conv_init(next(keys), 1, 1, last_c, head_c)}
    params["head"]["bn"], bs = _bn_init(head_c)
    state["head"] = {"bn": bs}
    return params, state


def efficientnet_features(params, state, x, variant: str = "b0",
                          train_bn: bool = False, taps: Tuple[int, ...] = ()):
    """x (B,H,W,3) normalized → (final (B,h,w,head_c), {block: act}, state)."""
    stem_c, blocks, _, _ = efficientnet_structure(variant)
    silu = jax.nn.silu
    new_state: Dict = {}
    tapped: Dict = {}
    h, ns = _bn(params["stem"]["bn"], state["stem"]["bn"],
                _conv(x, params["stem"]["w"], 2), train_bn)
    new_state["stem"] = {"bn": ns}
    h = silu(h)
    for bi, (k, cin, cout, stride, expand) in enumerate(blocks):
        bp = params[f"block{bi}"]
        bs = state[f"block{bi}"]
        ns = {}
        inp = h
        y = h
        if expand != 1:
            y, ns["bn_e"] = _bn(bp["expand"]["bn"], bs["bn_e"],
                                _conv(y, bp["expand"]["w"]), train_bn)
            y = silu(y)
        hidden = y.shape[-1]
        y, ns["bn_d"] = _bn(bp["dw"]["bn"], bs["bn_d"],
                            _conv(y, bp["dw"]["w"], stride, groups=hidden), train_bn)
        y = silu(y)
        # squeeze-excitation
        se = jnp.mean(y, axis=(1, 2), keepdims=True)
        se = silu(_conv(se, bp["se_reduce"]["w"]) + bp["se_reduce"]["b"])
        se = jax.nn.sigmoid(_conv(se, bp["se_expand"]["w"]) + bp["se_expand"]["b"])
        y = y * se
        y, ns["bn_p"] = _bn(bp["project"]["bn"], bs["bn_p"],
                            _conv(y, bp["project"]["w"]), train_bn)
        if stride == 1 and cin == cout:
            y = y + inp
        h = y
        new_state[f"block{bi}"] = ns
        if bi in taps:
            tapped[bi] = h
    h, ns = _bn(params["head"]["bn"], state["head"]["bn"],
                _conv(h, params["head"]["w"]), train_bn)
    new_state["head"] = {"bn": ns}
    return silu(h), tapped, new_state


@dataclass(frozen=True)
class EfficientNetAPRConfig:
    variant: str = "b3"
    feat_dim: int = 12


def init_efficientnet_apr(key, cfg: EfficientNetAPRConfig = EfficientNetAPRConfig()):
    kb, kf = jax.random.split(key)
    params, state = init_efficientnet_params(kb, cfg.variant)
    head_c = HEAD_DIM[cfg.variant]
    bound = 1.0 / np.sqrt(head_c)
    kw, kb2 = jax.random.split(kf)
    params["fc_pose"] = {
        "w": jax.random.uniform(kw, (head_c, cfg.feat_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb2, (cfg.feat_dim,), jnp.float32, -bound, bound),
    }
    return params, state


def efficientnet_apr_forward(params, state, x,
                             cfg: EfficientNetAPRConfig = EfficientNetAPRConfig(),
                             train_bn: bool = False):
    """EfficientNetB3/B0 APR: features → avgpool → fc pose (B, 12)."""
    from dfnet_tpu.models.vgg import imagenet_normalize

    backbone = {k: v for k, v in params.items() if k != "fc_pose"}
    final, _, new_state = efficientnet_features(
        backbone, state, imagenet_normalize(x), cfg.variant, train_bn)
    pooled = jnp.mean(final, axis=(1, 2))
    pose = pooled @ params["fc_pose"]["w"] + params["fc_pose"]["b"]
    return pose, new_state


def convert_efficientnet(sd, variant: str = "b3"):
    """lukemelas efficientnet_pytorch state_dict → (params, state).
    Key layout: _conv_stem/_bn0, _blocks.{i}.{_expand_conv,_bn0,
    _depthwise_conv,_bn1,_se_reduce,_se_expand,_project_conv,_bn2},
    _conv_head/_bn1. Best-effort (no golden weights available in this
    environment to verify against)."""
    import numpy as np

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}

    def conv(name):
        return jnp.asarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))

    def conv_b(name):
        out = {"w": conv(name)}
        if f"{name}.bias" in sd:
            out["b"] = jnp.asarray(sd[f"{name}.bias"])
        return out

    def bn(name):
        return ({"scale": jnp.asarray(sd[f"{name}.weight"]),
                 "bias": jnp.asarray(sd[f"{name}.bias"])},
                {"mean": jnp.asarray(sd[f"{name}.running_mean"]),
                 "var": jnp.asarray(sd[f"{name}.running_var"])})

    stem_c, blocks, _, _ = efficientnet_structure(variant)
    params = {"stem": {"w": conv("_conv_stem")}}
    state = {}
    params["stem"]["bn"], s0 = bn("_bn0")
    state["stem"] = {"bn": s0}
    for bi, (k, cin, cout, stride, expand) in enumerate(blocks):
        base = f"_blocks.{bi}"
        bp, bst = {}, {}
        if expand != 1:
            bp["expand"] = {"w": conv(f"{base}._expand_conv")}
            bp["expand"]["bn"], bst["bn_e"] = bn(f"{base}._bn0")
        bp["dw"] = {"w": conv(f"{base}._depthwise_conv")}
        bp["dw"]["bn"], bst["bn_d"] = bn(f"{base}._bn1")
        bp["se_reduce"] = {"w": conv(f"{base}._se_reduce"),
                           "b": jnp.asarray(sd[f"{base}._se_reduce.bias"])}
        bp["se_expand"] = {"w": conv(f"{base}._se_expand"),
                           "b": jnp.asarray(sd[f"{base}._se_expand.bias"])}
        bp["project"] = {"w": conv(f"{base}._project_conv")}
        bp["project"]["bn"], bst["bn_p"] = bn(f"{base}._bn2")
        params[f"block{bi}"] = bp
        state[f"block{bi}"] = bst
    params["head"] = {"w": conv("_conv_head")}
    params["head"]["bn"], s1 = bn("_bn1")
    state["head"] = {"bn": s1}
    return params, state
