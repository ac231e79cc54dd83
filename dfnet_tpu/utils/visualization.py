"""Visualization helpers: feature-saliency dumps, feature-map grids, and
predicted-vs-GT pose trajectory plots.

Functional parity: /root/reference/script/utils/utils.py:41-123
(save_image_saliancy / save_image_saliancy_single / plot_features — jet
colormap PNG dumps of per-channel feature maps) and
/root/reference/script/dm/pose_model.py:33-77 (vis_pose 3D scatter +
angular error strip). All host-side numpy/matplotlib.
"""

from __future__ import annotations

import os.path as osp
from typing import Dict

import numpy as np


def _to_numpy(x):
    return np.asarray(x)


def _make_grid(tensor: np.ndarray, nrow: int = 8, padding: int = 2,
               normalize: bool = False) -> np.ndarray:
    """(B,H,W) or (B,H,W,1) single-channel maps → one (H',W') grid."""
    t = _to_numpy(tensor)
    if t.ndim == 4:
        t = t[..., 0]
    if normalize:
        lo, hi = t.min(), t.max()
        t = (t - lo) / max(hi - lo, 1e-12)
    b, h, w = t.shape
    ncol = min(nrow, b)
    nrows = int(np.ceil(b / ncol))
    grid = np.zeros((nrows * (h + padding) + padding,
                     ncol * (w + padding) + padding), t.dtype)
    for i in range(b):
        r, c = divmod(i, ncol)
        y0 = r * (h + padding) + padding
        x0 = c * (w + padding) + padding
        grid[y0:y0 + h, x0:x0 + w] = t[i]
    return grid


def _jet(img01: np.ndarray) -> np.ndarray:
    import matplotlib.cm as cm

    return (cm.jet(np.clip(img01, 0, 1))[..., :3] * 255).astype(np.uint8)


def save_image_saliancy(features, path: str, normalize: bool = False):
    """Sum feature channels into a saliency map per sample, jet-colormap,
    save a grid PNG. features: (B, H, W, C) or (B, C, H, W)-like."""
    import imageio.v2 as imageio

    f = _to_numpy(features)
    if f.ndim == 4 and f.shape[-1] > 4:      # NHWC
        sal = f.sum(-1)
    elif f.ndim == 4:                        # NCHW
        sal = f.sum(1)
    else:
        sal = f
    grid = _make_grid(sal, normalize=True)
    imageio.imwrite(path if path.endswith(".png") else path + ".png", _jet(grid))


def save_image_saliancy_single(feature, path: str, normalize: bool = False):
    save_image_saliancy(_to_numpy(feature)[None] if _to_numpy(feature).ndim == 3
                        else feature, path, normalize)


def plot_features(features, path: str, normalize: bool = False,
                  max_channels: int = 64):
    """Dump per-channel feature maps of one sample as a grid PNG.
    features: (H, W, C)."""
    import imageio.v2 as imageio

    f = _to_numpy(features)
    chans = np.moveaxis(f, -1, 0)[:max_channels]   # (C,H,W)
    grid = _make_grid(chans, normalize=True)
    imageio.imwrite(path if path.endswith(".png") else path + ".png", _jet(grid))


def vis_pose(vis_info: Dict, path: str = "./vis_pose.png",
             ang_threshold: float = 10.0):
    """3D scatter of predicted vs GT camera positions + per-frame angular
    error strip (dm/pose_model.py:33-77)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pose = _to_numpy(vis_info["pose"])
    pose_gt = _to_numpy(vis_info["pose_gt"])
    theta = _to_numpy(vis_info["theta"])
    seq_num = theta.shape[0]

    fig = plt.figure(figsize=(8, 6))
    ax1 = fig.add_axes([0, 0.2, 0.9, 0.75], projection="3d")
    ax1.scatter(pose[:, 0], pose[:, 1], zs=pose[:, 2], c="r", s=9, depthshade=0)
    ax1.scatter(pose_gt[:, 0], pose_gt[:, 1], zs=pose_gt[:, 2], c="g", s=9,
                depthshade=0)
    ax1.view_init(30, 120)
    ax1.set_xlabel("x (m)")
    ax1.set_ylabel("y (m)")
    ax1.set_zlabel("z (m)")

    ax2 = fig.add_axes([0.1, 0.05, 0.75, 0.12])
    err = np.tile(theta.reshape(1, seq_num), (20, 1))
    ax2.imshow(err, vmin=0, vmax=ang_threshold, aspect="auto")
    ax2.set_yticks([])
    plt.savefig(path, dpi=50)
    plt.close(fig)
    return path
