"""Pose-error evaluation: the canonical APR metric.

Functional parity: /root/reference/script/dm/pose_model.py:79-191
(get_error_in_q / compute_error_in_q): per-image pose regression,
SVD-orthonormalized rotation, quaternion angular error
2·acos(|q·q̂|)·180/π plus translation L2, median+mean reported.

TPU-first: instead of batch-1 python loops, the whole split is forwarded
in fixed-size jitted batches; the (tiny) quaternion math runs on host.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfnet_tpu.data.scene import Split
from dfnet_tpu.pose import pose_errors, project_rotation_svd_np


def predict_poses(apply_fn: Callable, images: np.ndarray,
                  batch: int = 8) -> np.ndarray:
    """apply_fn: (B,H,W,3) → (B,12). Returns (N,3,4) numpy (no SVD)."""
    n = images.shape[0]
    preds = []
    for i in range(0, n, batch):
        chunk = images[i:i + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)], 0)
        out = np.asarray(apply_fn(jnp.asarray(chunk)))
        preds.append(out[: batch - pad] if pad else out)
    return np.concatenate(preds, 0).reshape(n, 3, 4)


def get_error_in_q(apply_fn: Callable, split: Split, batch: int = 8,
                   use_svd: bool = True, verbose: bool = True
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (median, mean) of per-image [trans_m, rot_deg] errors."""
    pred = predict_poses(apply_fn, split.images, batch)
    if use_svd:
        pred = project_rotation_svd_np(pred)
    gt = split.poses.reshape(-1, 3, 4)
    t_err, r_err = pose_errors(pred, gt)
    results = np.stack([t_err, r_err], -1)
    median = np.median(results, axis=0)
    mean = np.mean(results, axis=0)
    if verbose:
        print(f"Median error {median[0]}m and {median[1]} degrees.")
        print(f"Mean error {mean[0]}m and {mean[1]} degrees.")
    return median, mean
