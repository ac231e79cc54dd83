"""VGG16 feature encoder in JAX (NHWC).

Matches torchvision's vgg16.features layer stack, which the reference
uses as the DFNet backbone with hypercolumn taps at the conv1_2 /
conv3_3 / conv5_3 outputs — the raw conv outputs, PRE-ReLU (reference:
/root/reference/script/feature/dfnet.py:86-101,126-131: the tap is taken
immediately after encoder[i] where i is the conv's index).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels); 'M' = 2x2 maxpool. torchvision vgg16 config "D".
VGG16_LAYOUT = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), "M",
]

CONV_NAMES = [e[0] for e in VGG16_LAYOUT if e != "M"]

# torchvision vgg19 config "E" (the autoencoder_vgg3..7 zoo's encoder)
VGG19_LAYOUT = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512), "M",
]

# torch features-sequential index of each conv (conv,relu pairs + pools)
TORCH_CONV_INDEX = {}
_i = 0
for _e in VGG16_LAYOUT:
    if _e == "M":
        _i += 1
    else:
        TORCH_CONV_INDEX[_e[0]] = _i
        _i += 2

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _torch_conv_init(key, kh, kw, cin, cout):
    """torch.nn.Conv2d default: kaiming-uniform(a=√5) weights → bound
    √(6/((1+5)·fan_in)) = 1/√fan_in; bias uniform with the same bound."""
    kw_, kb = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw_, (kh, kw, cin, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_vgg16_params(key) -> Dict:
    params = {}
    cin = 3
    keys = jax.random.split(key, len(CONV_NAMES))
    for k, entry in zip(keys, [e for e in VGG16_LAYOUT if e != "M"]):
        name, cout = entry
        params[name] = _torch_conv_init(k, 3, 3, cin, cout)
        cin = cout
    return params


def conv2d(p, x, stride: int = 1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def vgg16_features(params: Dict, x: jnp.ndarray,
                   taps: Sequence[str] = (),
                   run_to_end: bool = True) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """x: (B,H,W,3), already ImageNet-normalized. Returns (final, taps)
    where taps are the PRE-ReLU conv outputs of the named layers. If
    run_to_end is False, stops after the last tap (DFNet's
    return_pose=False early exit, dfnet.py:133-136)."""
    taps = list(taps)
    got: List[jnp.ndarray] = []
    last_tap = taps[-1] if taps else None
    for entry in VGG16_LAYOUT:
        if entry == "M":
            x = maxpool2(x)
            continue
        name, _ = entry
        x = conv2d(params[name], x)
        if name in taps:
            got.append(x)
            if name == last_tap and not run_to_end:
                return x, got
        x = jax.nn.relu(x)
    return x, got


def imagenet_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """x: (...,3) RGB in [0,1]."""
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def init_vgg_params(key, layout) -> Dict:
    """Init conv params for any VGG layout (16/19)."""
    convs = [e for e in layout if e != "M"]
    params = {}
    cin = 3
    for k, (name, cout) in zip(jax.random.split(key, len(convs)), convs):
        params[name] = _torch_conv_init(k, 3, 3, cin, cout)
        cin = cout
    return params


def vgg_features_by_index(params: Dict, x: jnp.ndarray, layout,
                          tap_indices: Sequence[int]):
    """Run a VGG features stack tapping POST-op outputs at the given
    torch features-sequential indices (conv,relu pairs + pools — the
    autoencoder zoo taps post-ReLU, e.g. index 3 = ReLU-4). Returns
    (final pre-classifier tensor, taps in request order)."""
    want = set(tap_indices)
    got = {}
    i = 0
    for entry in layout:
        if entry == "M":
            x = maxpool2(x)
            if i in want:
                got[i] = x
            i += 1
            continue
        name, _ = entry
        x = conv2d(params[name], x)
        if i in want:
            got[i] = x
        i += 1
        x = jax.nn.relu(x)
        if i in want:
            got[i] = x
        i += 1
    return x, [got[j] for j in tap_indices]
