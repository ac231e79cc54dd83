"""Convolutional autoencoder (the reference's early feature-extraction
experiment line).

Functional parity target: /root/reference/script/feature/model.py's
ConvAutoencoder / autoencoder_vgg* family — encoder/decoder conv stacks
used to learn render↔photo invariant features before DFNet superseded
them. One representative, configurable implementation: a VGG-style
encoder (conv-relu ×2 + pool per level) and a mirrored
upsample+conv decoder reconstructing the input; the bottleneck features
double as matching features.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfnet_tpu.models.vgg import _torch_conv_init, conv2d, maxpool2
from dfnet_tpu.ops.resize import resize_bilinear_align_corners


@dataclass(frozen=True)
class ConvAutoencoderConfig:
    widths: Tuple[int, ...] = (32, 64, 128)   # encoder level widths


def init_autoencoder_params(key, cfg: ConvAutoencoderConfig = ConvAutoencoderConfig()):
    keys = iter(jax.random.split(key, 4 * len(cfg.widths) + 2))
    enc: List[Dict] = []
    cin = 3
    for w in cfg.widths:
        enc.append({"conv1": _torch_conv_init(next(keys), 3, 3, cin, w),
                    "conv2": _torch_conv_init(next(keys), 3, 3, w, w)})
        cin = w
    dec: List[Dict] = []
    for w in reversed(cfg.widths[:-1]):
        dec.append({"conv": _torch_conv_init(next(keys), 3, 3, cin, w)})
        cin = w
    dec.append({"conv": _torch_conv_init(next(keys), 3, 3, cin, 3)})
    return {"enc": enc, "dec": dec}


def autoencoder_forward(params: Dict, x: jnp.ndarray,
                        return_features: bool = False):
    """x: (B,H,W,3) → (reconstruction (B,H,W,3), bottleneck features)."""
    h = x
    for level in params["enc"]:
        h = jax.nn.relu(conv2d(level["conv1"], h))
        h = jax.nn.relu(conv2d(level["conv2"], h))
        h = maxpool2(h)
    features = h
    for i, level in enumerate(params["dec"]):
        b, hh, ww, _ = h.shape
        h = resize_bilinear_align_corners(h, hh * 2, ww * 2)
        h = conv2d(level["conv"], h)
        if i < len(params["dec"]) - 1:
            h = jax.nn.relu(h)
    recon = jax.nn.sigmoid(h)
    if return_features:
        return recon, features
    return recon
