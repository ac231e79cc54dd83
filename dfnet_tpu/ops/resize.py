"""Image resize ops with exact torch semantics.

The reference uses two distinct resamplers whose conventions matter for
checkpoint parity:
  - torch.nn.UpsamplingBilinear2d(size) — bilinear, align_corners=True
    (feature-map upsampling in DFNet, dfnet.py:145,156-157);
  - torch.nn.Upsample(mode='bicubic') — bicubic, align_corners=False
    (quarter-res render upsampling, direct_feature_matching.py:346).
jax.image.resize implements neither exactly, so both are built here from
explicit gathers; they are differentiable (stage 3 backpropagates
through the bicubic upsample into the rendered image).
Layout: NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _align_corners_coords(out_size: int, in_size: int) -> np.ndarray:
    if out_size == 1 or in_size == 1:
        return np.zeros(out_size, np.float32)
    return (np.arange(out_size) * (in_size - 1) / (out_size - 1)).astype(np.float32)


def _bilinear_axis_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) dense interpolation matrix for align_corners=True."""
    cs = _align_corners_coords(out_size, in_size)
    i0 = np.floor(cs).astype(np.int32)
    i1 = np.minimum(i0 + 1, in_size - 1)
    t = cs - i0
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), i0] += 1.0 - t
    m[np.arange(out_size), i1] += t
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """x: (..., H, W, C) → (..., out_h, out_w, C), align_corners=True.

    Formulated as two small dense matmuls (separable linear resample)
    instead of gathers: TPU gathers on multi-MB feature maps relayout
    and serialize on the VPU, while an (out,in)@(...,in,·) contraction
    rides the MXU. With align_corners=True an out==in axis matrix is
    exactly the identity, so the common level-0 case (tap already at
    target resolution) short-circuits for free."""
    h, w = x.shape[-3], x.shape[-2]
    if out_h == h and out_w == w:
        return x
    dt = x.dtype
    if out_w != w:
        mx = jnp.asarray(_bilinear_axis_matrix(out_w, w), dt)
        x = jnp.einsum("...wc,vw->...vc", x, mx)
    if out_h != h:
        my = jnp.asarray(_bilinear_axis_matrix(out_h, h), dt)
        x = jnp.einsum("...hwc,gh->...gwc", x, my)
    return x


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Torch/OpenCV cubic convolution kernel (Keys, a=-0.75)."""
    at = np.abs(t)
    w = np.where(
        at <= 1,
        (a + 2) * at**3 - (a + 3) * at**2 + 1,
        np.where(at < 2, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )
    return w.astype(np.float32)


def _bicubic_axis_weights(out_size: int, in_size: int):
    """Half-pixel (align_corners=False) source coords → 4-tap indices+weights."""
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int32)
    idx = np.stack([i0 - 1, i0, i0 + 1, i0 + 2], -1)          # (out, 4)
    t = src[:, None] - idx                                     # signed distances
    w = _cubic_kernel(t)
    idx = np.clip(idx, 0, in_size - 1)
    return idx, w


def resize_bicubic(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """x: (..., H, W, C) → (..., out_h, out_w, C). torch nn.Upsample
    bicubic, align_corners=False (no antialias)."""
    h, w = x.shape[-3], x.shape[-2]
    iy, wy = _bicubic_axis_weights(out_h, h)
    ix, wx = _bicubic_axis_weights(out_w, w)
    wy = jnp.asarray(wy)
    wx = jnp.asarray(wx)

    # rows: gather 4 taps per output row and combine
    rows = jnp.take(x, jnp.asarray(iy.reshape(-1)), axis=-3)
    rows = rows.reshape(x.shape[:-3] + (out_h, 4) + x.shape[-2:])
    rows = jnp.einsum("...hkwc,hk->...hwc", rows, wy)
    cols = jnp.take(rows, jnp.asarray(ix.reshape(-1)), axis=-2)
    cols = cols.reshape(rows.shape[:-2] + (out_w, 4) + rows.shape[-1:])
    return jnp.einsum("...wkc,wk->...wc", cols, wx)
