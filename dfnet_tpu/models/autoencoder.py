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


# ---------------------------------------------------------------------------
# autoencoder_vgg1..7 zoo (reference feature/model.py:45-390 — the
# abandoned experiment line predating DFNet, kept for completeness)
# ---------------------------------------------------------------------------

def _torch_convT_init(key, kh, kw, cin, cout):
    """torch.nn.ConvTranspose2d default init (fan_in = cout*k*k in torch's
    convention since weight is (cin, cout, kh, kw))."""
    kw_, kb = jax.random.split(key)
    fan_in = kh * kw * cout
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw_, (kh, kw, cout, cin), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def conv2d_transpose(p, x, stride: int = 1, padding: int = 0,
                     output_padding: int = 0):
    """torch.nn.ConvTranspose2d semantics: out = (in-1)*s - 2*p + k + op.
    p['w'] is (kh, kw, cout, cin) (torch (cin,cout,kh,kw) transposed to
    HWOI; see convert.py)."""
    k = p["w"].shape[0]
    lo = k - 1 - padding
    hi = lo + output_padding
    y = jax.lax.conv_transpose(
        x, p["w"], (stride, stride), ((lo, hi), (lo, hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    return y + p["b"]


def init_autoencoder_vgg1(key) -> Dict:
    ks = jax.random.split(key, 6)
    return {
        "e1": _torch_conv_init(ks[0], 3, 3, 3, 16),
        "e2": _torch_conv_init(ks[1], 3, 3, 16, 32),
        "e3": _torch_conv_init(ks[2], 7, 7, 32, 64),
        "d1": _torch_convT_init(ks[3], 7, 7, 64, 32),
        "d2": _torch_convT_init(ks[4], 3, 3, 32, 16),
        "d3": _torch_convT_init(ks[5], 3, 3, 16, 3),
    }


def autoencoder_vgg1(params: Dict, x: jnp.ndarray):
    """(B,H,W,3) in [-1,1] → (encoding, tanh reconstruction)
    (model.py:45-67)."""
    h = jax.nn.relu(conv2d(params["e1"], x, stride=2, padding=((1, 1), (1, 1))))
    h = jax.nn.relu(conv2d(params["e2"], h, stride=2, padding=((1, 1), (1, 1))))
    enc = conv2d(params["e3"], h, padding="VALID")
    d = jax.nn.relu(conv2d_transpose(params["d1"], enc))
    d = jax.nn.relu(conv2d_transpose(params["d2"], d, stride=2, padding=1,
                                     output_padding=1))
    d = jnp.tanh(conv2d_transpose(params["d3"], d, stride=2, padding=1,
                                  output_padding=1))
    return enc, d


init_autoencoder_vgg2 = init_autoencoder_vgg1


def autoencoder_vgg2(params: Dict, x: jnp.ndarray):
    """vgg1 + encoder/decoder skip connections; returns (None, recon)
    (model.py:69-111)."""
    f1 = jax.nn.relu(conv2d(params["e1"], x, stride=2, padding=((1, 1), (1, 1))))
    f2 = jax.nn.relu(conv2d(params["e2"], f1, stride=2, padding=((1, 1), (1, 1))))
    h = conv2d(params["e3"], f2, padding="VALID")
    h = jax.nn.relu(conv2d_transpose(params["d1"], h)) + f2
    h = jax.nn.relu(conv2d_transpose(params["d2"], h, stride=2, padding=1,
                                     output_padding=1)) + f1
    h = jnp.tanh(conv2d_transpose(params["d3"], h, stride=2, padding=1,
                                  output_padding=1))
    return None, h


# -- VGG19-encoder variants -------------------------------------------------

def _vgg19():
    from dfnet_tpu.models.vgg import VGG19_LAYOUT, init_vgg_params, \
        vgg_features_by_index

    return VGG19_LAYOUT, init_vgg_params, vgg_features_by_index


def init_autoencoder_vgg3(key) -> Dict:
    layout, init_vgg, _ = _vgg19()
    ke, k1, k2, k3, k4 = jax.random.split(key, 5)
    return {
        "encoder": init_vgg(ke, layout),
        "d1": _torch_convT_init(k1, 2, 2, 512, 512),
        "d2": _torch_convT_init(k2, 4, 4, 512, 256),
        "d3": _torch_convT_init(k3, 4, 4, 256, 64),
        "d4": _torch_conv_init(k4, 3, 3, 64, 3),
    }


def autoencoder_vgg3(params: Dict, x: jnp.ndarray):
    """VGG19 encoder + transpose-conv decoder with skip adds at ReLU-36/
    ReLU-18/ReLU-4 (model.py:113-155). Returns (feat_out, tanh recon)."""
    layout, _, features = _vgg19()
    h, (t3, t17, t35) = features(params["encoder"], x, layout, (3, 17, 35))
    feat_out = []
    h = jax.nn.relu(conv2d_transpose(params["d1"], h, stride=2)) + t35
    feat_out.append(h)
    h = jax.nn.relu(conv2d_transpose(params["d2"], h, stride=4)) + t17
    feat_out.append(h)
    h = jax.nn.relu(conv2d_transpose(params["d3"], h, stride=4)) + t3
    feat_out.append(h)
    h = jnp.tanh(conv2d(params["d4"], h))
    return feat_out, h


def _conv_decoder_params(key, widths):
    ks = jax.random.split(key, len(widths) - 1)
    return [{"conv": _torch_conv_init(k, 3, 3, cin, cout)}
            for k, cin, cout in zip(ks, widths[:-1], widths[1:])]


def init_autoencoder_vgg4(key) -> Dict:
    layout, init_vgg, _ = _vgg19()
    ke, kd = jax.random.split(key)
    return {"encoder": init_vgg(ke, layout),
            "decoder": _conv_decoder_params(kd, (512, 512, 256, 64, 3))}


def _upsample_to(h, ref):
    return resize_bilinear_align_corners(h, ref.shape[1], ref.shape[2])


def autoencoder_vgg4(params: Dict, x: jnp.ndarray):
    """VGG19 encoder + conv decoder with bilinear upsample-to-tap + skip
    adds (model.py:157-212). Returns (feat_out, sigmoid recon)."""
    layout, _, features = _vgg19()
    h, (t3, t17, t35) = features(params["encoder"], x, layout, (3, 17, 35))
    feat_out = []
    dec = params["decoder"]
    h = _upsample_to(jax.nn.relu(conv2d(dec[0]["conv"], h)), t35) + t35
    feat_out.append(h)
    h = _upsample_to(jax.nn.relu(conv2d(dec[1]["conv"], h)), t17) + t17
    feat_out.append(h)
    h = _upsample_to(jax.nn.relu(conv2d(dec[2]["conv"], h)), t3) + t3
    feat_out.append(h)
    h = jax.nn.sigmoid(conv2d(dec[3]["conv"], h))
    return feat_out, h


def init_autoencoder_vgg5(key) -> Dict:
    layout, init_vgg, _ = _vgg19()
    ke, kd = jax.random.split(key)
    return {"encoder": init_vgg(ke, layout),
            "decoder": _conv_decoder_params(
                kd, (512, 512, 512, 256, 128, 64, 3))}


def _vgg5_core(params: Dict, x: jnp.ndarray, pool_mean=None):
    """Shared vgg5/vgg6 body: 5-tap VGG19 encoder, 5-level conv decoder
    with upsample-to-tap skip adds; feat_out collects the three finest
    levels (optionally channel-mean-pooled + upsampled, vgg6)."""
    layout, _, features = _vgg19()
    h, taps = features(params["encoder"], x, layout, (3, 8, 17, 26, 35))
    t3, t8, t17, t26, t35 = taps
    dec = params["decoder"]
    feat_out = []
    h = _upsample_to(jax.nn.relu(conv2d(dec[0]["conv"], h)), t35) + t35
    h = _upsample_to(jax.nn.relu(conv2d(dec[1]["conv"], h)), t26) + t26
    for d, t in ((2, t17), (3, t8), (4, t3)):
        h = _upsample_to(jax.nn.relu(conv2d(dec[d]["conv"], h)), t) + t
        feat_out.append(pool_mean(h) if pool_mean else h)
    return feat_out, h, dec


def autoencoder_vgg5(params: Dict, x: jnp.ndarray):
    """model.py:214-293. Returns (feat_out, sigmoid recon)."""
    feat_out, h, dec = _vgg5_core(params, x)
    h = jax.nn.sigmoid(conv2d(dec[5]["conv"], h))
    return feat_out, h


def init_autoencoder_vgg6(key) -> Dict:
    layout, init_vgg, _ = _vgg19()
    ke, kd = jax.random.split(key)
    return {"encoder": init_vgg(ke, layout),
            "decoder": _conv_decoder_params(kd, (512, 512, 512, 256, 128, 64))}


def autoencoder_vgg6(params: Dict, x: jnp.ndarray, upsampleH: int,
                     upsampleW: int):
    """Robust-feature variant: decoder features are channel-mean-pooled
    and bilinear-upsampled to a common size (model.py:295-367)."""
    def pool(h):
        return resize_bilinear_align_corners(h, upsampleH, upsampleW).mean(-1)

    feat_out, h, _ = _vgg5_core(params, x, pool_mean=pool)
    return feat_out, h


def init_autoencoder_vgg7(key) -> Dict:
    layout, init_vgg, _ = _vgg19()
    return {"encoder": init_vgg(key, layout)}


def autoencoder_vgg7(params: Dict, x: jnp.ndarray, upsampleH: int = 224,
                     upsampleW: int = 224):
    """Encoder-only: channel-mean of ReLU-4/ReLU-9/ReLU-18 taps upsampled
    to a common size (model.py:369-390)."""
    layout, _, features = _vgg19()
    h, taps = features(params["encoder"], x, layout, (3, 8, 17))
    feat_out = [resize_bilinear_align_corners(t, upsampleH, upsampleW).mean(-1)
                for t in taps]
    return feat_out, h
