"""DFNet — siamese pose regressor + domain-invariant feature extractor.

Architecture parity (reference: /root/reference/script/feature/dfnet.py):
  - VGG16 encoder with hypercolumn taps at conv1_2/conv3_3/conv5_3
    (DFNet) or conv1_2 only (DFNet_s), taps taken PRE-ReLU;
  - per-level adaptation: 1x1 conv → ReLU → 5x5 conv → BatchNorm
    (S2DNet-style off-branches, dfnet.py:42-72);
  - features bilinearly upsampled (align_corners=True) to a common
    (upsampleH, upsampleW) and stacked per level; siamese calls split
    the batch halves into (target, rendered) stacks;
  - pose head: global average pool of the pool5 output → Linear(512,12);
  - ImageNet normalization happens INSIDE the model (dfnet.py:121-122).

Layout: NHWC. Features returned as (L, B, H, W, C).
BatchNorm carries running statistics in a separate `state` pytree;
train-mode BN returns updated state (the reference's freezeBN path =
eval-mode BN with stop-gradient scale/bias).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfnet_tpu.models.vgg import (
    VGG16_LAYOUT,
    imagenet_normalize,
    init_vgg16_params,
    vgg16_features,
    _torch_conv_init,
    conv2d,
)
from dfnet_tpu.ops.resize import resize_bilinear_align_corners

_VGG_CHANNELS = {name: c for name, c in [e for e in VGG16_LAYOUT if e != "M"]}

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


@dataclass(frozen=True)
class DFNetConfig:
    hypercolumn_layers: Tuple[str, ...] = ("conv1_2", "conv3_3", "conv5_3")
    output_dim: int = 128
    feat_dim: int = 12          # 3x4 pose

    @classmethod
    def small(cls) -> "DFNetConfig":
        """DFNet_s — conv1_2 tap only (dfnet.py:174-273)."""
        return cls(hypercolumn_layers=("conv1_2",))


def init_dfnet_params(key, cfg: DFNetConfig = DFNetConfig()) -> Tuple[Dict, Dict]:
    """Returns (params, state). state holds BN running mean/var."""
    k_enc, k_fc, *k_adapt = jax.random.split(key, 2 + len(cfg.hypercolumn_layers))
    params: Dict = {"encoder": init_vgg16_params(k_enc)}
    state: Dict = {"adapt": {}}
    params["adapt"] = {}
    for i, name in enumerate(cfg.hypercolumn_layers):
        cin = _VGG_CHANNELS[name]
        k1, k2 = jax.random.split(k_adapt[i])
        params["adapt"][str(i)] = {
            "conv1": _torch_conv_init(k1, 1, 1, cin, 64),
            "conv2": _torch_conv_init(k2, 5, 5, 64, cfg.output_dim),
            "bn_scale": jnp.ones((cfg.output_dim,), jnp.float32),
            "bn_bias": jnp.zeros((cfg.output_dim,), jnp.float32),
        }
        state["adapt"][str(i)] = {
            "mean": jnp.zeros((cfg.output_dim,), jnp.float32),
            "var": jnp.ones((cfg.output_dim,), jnp.float32),
        }
    bound = 1.0 / np.sqrt(512)
    kw, kb = jax.random.split(k_fc)
    params["fc_pose"] = {
        "w": jax.random.uniform(kw, (512, cfg.feat_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cfg.feat_dim,), jnp.float32, -bound, bound),
    }
    return params, state


def _batchnorm(p, s, x, train: bool):
    """(B,H,W,C) BatchNorm2d. Returns (y, new_running).

    Statistics and the affine transform always run in f32 — with the
    bf16 compute path the per-channel mean/var of ~1e5 activations
    would otherwise lose all mantissa (running stats are the model
    state torch checkpoints round-trip through)."""
    x = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new = s
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * p["bn_scale"] + p["bn_bias"]
    return y, new


def _adapt_level(p, s, f, train_bn: bool):
    if f.dtype != jnp.float32:
        p = {**p,
             "conv1": jax.tree.map(lambda a: a.astype(f.dtype), p["conv1"]),
             "conv2": jax.tree.map(lambda a: a.astype(f.dtype), p["conv2"])}
    h = jax.nn.relu(conv2d(p["conv1"], f))
    h = conv2d(p["conv2"], h)
    return _batchnorm(p, s, h, train_bn)


def dfnet_forward(
    params: Dict,
    state: Dict,
    x: jnp.ndarray,                 # (B or 2B, H, W, 3) RGB in [0,1]
    cfg: DFNetConfig = DFNetConfig(),
    return_feature: bool = False,
    is_single_stream: bool = False,
    return_pose: bool = True,
    upsample_h: int = 240,
    upsample_w: int = 427,
    train_bn: bool = False,
    compute_dtype=jnp.float32,
    feature_count: int | None = None,
):
    """Returns (feature_maps, pose, new_state).

    feature_maps: None, or (single,) with single (L,B,H,W,C), or
    (target_stack, render_stack) for siamese input [targets; renders].
    pose: (B, feat_dim) or None when return_pose=False.

    feature_count: only the first `feature_count` batch entries flow
    through the adapt/upsample feature branch (default: all). Lets a
    caller append extra pose-only images (e.g. stage-2 RVS views,
    run_feature.py:219-227) to the SAME encoder dispatch: the encoder
    has no batch coupling (pure convs) and the pose head is per-image,
    so results are identical to a separate forward — adapt BatchNorm
    batch statistics see exactly the first `feature_count` images.

    compute_dtype=bfloat16 runs the conv stacks (VGG encoder + adapt
    branches) on the MXU's bf16 path with f32 accumulation — master
    params stay f32 (the cast's VJP returns f32 grads), BatchNorm
    statistics / global pooling / pose head / losses stay f32. This is
    the TPU mixed-precision regime the stage-1 NeRF kernels already
    use (cfg.feature_precision wires it into stages 2/3).
    """
    x = imagenet_normalize(x)
    enc = params["encoder"]
    if compute_dtype != jnp.float32:
        x = x.astype(compute_dtype)
        enc = jax.tree.map(lambda a: a.astype(compute_dtype), enc)
    final, taps = vgg16_features(enc, x, cfg.hypercolumn_layers,
                                 run_to_end=return_pose)

    feature_maps = None
    new_state = state
    if return_feature:
        fc = x.shape[0] if feature_count is None else feature_count
        adapted = []
        new_adapt = {}
        for i, f in enumerate(taps):
            a, ns = _adapt_level(params["adapt"][str(i)],
                                 state["adapt"][str(i)], f[:fc], train_bn)
            # feature maps ride the compute dtype through the (large)
            # upsample + feature-loss path — BN statistics above stayed
            # f32; distance reductions in the losses accumulate f32
            adapted.append(a.astype(compute_dtype))
            new_adapt[str(i)] = ns
        new_state = {**state, "adapt": new_adapt}
        ups = [resize_bilinear_align_corners(a, upsample_h, upsample_w)
               for a in adapted]
        if is_single_stream:
            feature_maps = (jnp.stack(ups),)                       # (L,B,H,W,C)
        else:
            b = ups[0].shape[0]
            t_stack = jnp.stack([u[: b // 2] for u in ups])
            r_stack = jnp.stack([u[b // 2:] for u in ups])
            feature_maps = (t_stack, r_stack)

    if not return_pose:
        return feature_maps, None, new_state

    pooled = jnp.mean(final.astype(jnp.float32), axis=(1, 2))      # (B, 512)
    pose = pooled @ params["fc_pose"]["w"] + params["fc_pose"]["b"]
    return feature_maps, pose, new_state
