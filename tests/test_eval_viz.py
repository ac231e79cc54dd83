"""Direct tests for the canonical pose-error metric and the viz dumps.

get_error_in_q parity target: /root/reference/script/dm/pose_model.py:
79-191 — per-image SVD-orthonormalized R, quaternion angular error
2*acos(|q1.q2|) in degrees, L2 translation error in meters, median+mean.
"""

import os.path as osp

import jax
import numpy as np
import pytest

from dfnet_tpu.training.eval_pose import get_error_in_q


class _Split:
    def __init__(self, images, poses):
        self.images = images
        self.poses = poses

    def __len__(self):
        return len(self.images)


def _rot_z(deg):
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float32)


def _pose(R, t):
    return np.concatenate([R, np.asarray(t, np.float32)[:, None]], -1)


def test_known_rotation_and_translation_errors():
    n = 6
    images = np.zeros((n, 4, 4, 3), np.float32)
    gt = np.stack([_pose(np.eye(3, dtype=np.float32), [0, 0, 0])] * n)
    # predictions: rotated 10 deg about z, translated 0.3 m along x
    pred = np.stack([_pose(_rot_z(10.0), [0.3, 0, 0])] * n)

    def apply_fn(imgs):
        b = imgs.shape[0]
        return jax.numpy.asarray(pred[:b].reshape(b, 12))

    med, mean = get_error_in_q(apply_fn, _Split(images, gt), batch=4,
                               verbose=False)
    np.testing.assert_allclose(med[0], 0.3, atol=1e-5)    # meters
    np.testing.assert_allclose(med[1], 10.0, atol=1e-3)   # degrees
    np.testing.assert_allclose(mean[0], 0.3, atol=1e-5)
    np.testing.assert_allclose(mean[1], 10.0, atol=1e-3)


def test_error_median_vs_mean_split():
    """Half the frames exact, half 20 deg off -> median reflects the
    sorted middle, mean the average."""
    images = np.zeros((4, 4, 4, 3), np.float32)
    gt = np.stack([_pose(np.eye(3, dtype=np.float32), [0, 0, 0])] * 4)
    pred = np.stack([
        _pose(np.eye(3, dtype=np.float32), [0, 0, 0]),
        _pose(np.eye(3, dtype=np.float32), [0, 0, 0]),
        _pose(_rot_z(20.0), [1.0, 0, 0]),
        _pose(_rot_z(20.0), [1.0, 0, 0]),
    ])

    def apply_fn(imgs):
        # batch==len so the order is preserved
        return jax.numpy.asarray(pred.reshape(4, 12))

    med, mean = get_error_in_q(apply_fn, _Split(images, gt), batch=4,
                               verbose=False)
    np.testing.assert_allclose(med[1], 10.0, atol=1e-3)   # middle of 0,0,20,20
    np.testing.assert_allclose(mean[1], 10.0, atol=1e-3)
    np.testing.assert_allclose(mean[0], 0.5, atol=1e-5)


def test_non_orthonormal_prediction_is_projected():
    """A scaled/skewed predicted R is SVD-projected before the quaternion
    (reference pose_model.py:115-117), so a scaled identity is 0 deg."""
    images = np.zeros((2, 4, 4, 3), np.float32)
    gt = np.stack([_pose(np.eye(3, dtype=np.float32), [0, 0, 0])] * 2)
    pred = np.stack([_pose(2.5 * np.eye(3, dtype=np.float32), [0, 0, 0])] * 2)

    def apply_fn(imgs):
        return jax.numpy.asarray(pred.reshape(2, 12))

    med, _ = get_error_in_q(apply_fn, _Split(images, gt), batch=2,
                            verbose=False)
    assert med[1] < 1e-2


def test_visualization_dumps(tmp_path):
    from dfnet_tpu.utils.visualization import (
        plot_features,
        save_image_saliancy,
        save_image_saliancy_single,
        vis_pose,
    )

    rng = np.random.default_rng(0)
    feats = rng.uniform(size=(4, 16, 16, 8)).astype(np.float32)  # NHWC
    p1 = str(tmp_path / "sal.png")
    save_image_saliancy(feats, p1, normalize=True)
    assert osp.exists(p1)
    p2 = str(tmp_path / "sal1.png")
    save_image_saliancy_single(feats[0], p2, normalize=True)
    assert osp.exists(p2)
    p3 = str(tmp_path / "feat.png")
    plot_features(feats[0], p3, normalize=True)   # (H, W, C)
    assert osp.exists(p3)

    pos = rng.normal(size=(5, 3)).astype(np.float32)
    p4 = str(tmp_path / "pose.png")
    vis_pose({"pose": pos, "pose_gt": pos + 0.05,
              "theta": np.ones((5,), np.float32)}, p4)
    assert osp.exists(p4)
