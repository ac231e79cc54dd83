"""Color-space and luminance-histogram utilities.

The histogram label is the key input of the "Histogram-assisted" NeRF:
each image's Y-channel intensity histogram (10 bins over [0,1], as
rounded percentages) indexes the appearance/transient embedding tables
(reference: /root/reference/dataset_loaders/seven_scenes.py:346-352,
dataset_loaders/utils/color.py).
"""

from __future__ import annotations

import numpy as np

# BT.601-ish YUV matrix (matches the kornia rgb_to_yuv used by the reference)
_YUV = np.array(
    [[0.299, 0.587, 0.114],
     [-0.147, -0.289, 0.436],
     [0.615, -0.515, -0.100]], dtype=np.float32)


def rgb_to_yuv(img: np.ndarray) -> np.ndarray:
    """RGB (..., 3) in [0,1] → YUV (..., 3). Channel-last."""
    return img @ _YUV.T


def luminance_histogram(img_hwc: np.ndarray, bins: int = 10) -> np.ndarray:
    """Rounded percentage histogram of the Y channel.

    Equivalent to torch.histc(y, bins, 0, 1) → /sum*100 → round
    (round-half-to-even, same as torch). Returns int32 (bins,), each in
    [0, 100] — used as indices into the N_vocab embedding tables.
    """
    y = rgb_to_yuv(img_hwc)[..., 0]
    hist, _ = np.histogram(y, bins=bins, range=(0.0, 1.0))
    hist = hist.astype(np.float64)
    total = hist.sum()
    if total > 0:
        hist = hist / total * 100.0
    return np.round(hist).astype(np.int32)


def downscale_area(img: np.ndarray, df: float) -> np.ndarray:
    """cv2.INTER_AREA downscale by factor df (H//df, W//df), matching the
    reference's dataset resize (seven_scenes.py:328-332)."""
    if df == 1.0:
        return img
    import cv2

    h, w = img.shape[:2]
    dims = (int(w // df), int(h // df))
    return cv2.resize(img, dims, interpolation=cv2.INTER_AREA)
