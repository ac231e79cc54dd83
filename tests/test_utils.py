import numpy as np
import pytest

import jax.numpy as jnp

from dfnet_tpu.utils.kalman import Kalman1D, Kalman3D
from dfnet_tpu.utils.metrics import dssim, mse, psnr, ssim
from dfnet_tpu.utils.homography import (
    _get_perspective_transform, compute_valid_mask, inv_warp_image_batch,
    sample_homography_np, warp_points,
)
from dfnet_tpu.data.view_selection import (
    camera_frustum_initializer, compute_frustums_overlap, fetch_unique_view_index,
    generate_render_pose, perturb_render_pose, render_path_spiral,
    remove_overlap_data,
)
from dfnet_tpu.data.synthetic import make_synthetic_scene, sphere_poses


# ------------------------------------------------------------------ metrics

def test_psnr_known_value():
    a = jnp.zeros((20, 20, 3))
    b = jnp.full((20, 20, 3), 0.1)
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-4)


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    assert float(dssim(img, img)) == pytest.approx(0.0, abs=1e-5)
    noisy = img + 0.2 * jnp.asarray(rng.normal(size=(16, 16, 3)).astype(np.float32))
    assert float(ssim(img, noisy)) < 0.95


# ------------------------------------------------------------------ kalman

def test_kalman_smoothing_reduces_noise():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 4 * np.pi, 200)
    clean = np.sin(t)
    noisy = clean + 0.3 * rng.normal(size=t.shape)
    sm = Kalman1D(noisy, damping=1.0)[:, 0]
    assert np.mean((sm - clean) ** 2) < 0.5 * np.mean((noisy - clean) ** 2)
    traj = np.stack([clean, clean * 2, clean - 1], 1) + 0.2 * rng.normal(size=(200, 3))
    sm3 = Kalman3D(traj, damping=1.0)
    assert sm3.shape == (200, 3)


# ------------------------------------------------------------------ homography

def test_perspective_transform_identity():
    pts = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
    H = _get_perspective_transform(pts, pts)
    np.testing.assert_allclose(H, np.eye(3), atol=1e-10)


def test_warp_points_roundtrip():
    rng = np.random.default_rng(1)
    H = sample_homography_np([32, 48], rng=rng)
    pts = rng.uniform(5, 25, (10, 2))
    w = np.asarray(warp_points(pts, H))
    back = np.asarray(warp_points(w, np.linalg.inv(H)))
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_inv_warp_identity():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (1, 16, 20, 3)).astype(np.float32)
    out = np.asarray(inv_warp_image_batch(img, np.eye(3)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_inv_warp_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 12, 14, 1)).astype(np.float32)
    H = sample_homography_np([12, 14], rng=rng)
    ours = np.asarray(inv_warp_image_batch(img, H))

    # torch reference: same normalized-coords grid warp
    xs = torch.linspace(-1, 1, 14)
    ys = torch.linspace(-1, 1, 12)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    cells = torch.stack([gx, gy], -1).reshape(-1, 2)
    pts = torch.cat([cells, torch.ones(cells.shape[0], 1)], 1)
    Ht = torch.tensor(H, dtype=torch.float32)
    w = (Ht @ pts.T).T
    w = (w[:, :2] / w[:, 2:]).reshape(1, 12, 14, 2)
    timg = torch.tensor(img).permute(0, 3, 1, 2)
    ref = F.grid_sample(timg, w, mode="bilinear", align_corners=True)
    np.testing.assert_allclose(ours[..., 0], ref[:, 0].numpy(), atol=1e-4)


def test_compute_valid_mask_identity_all_valid():
    m = compute_valid_mask((10, 12), np.eye(3))
    assert m.shape == (1, 10, 12)
    # interior fully valid (borders may see sub-pixel attenuation)
    assert (m[:, 1:-1, 1:-1] > 0.5).all()
    # a strong shift invalidates a band
    H = np.eye(3)
    H[0, 2] = 6.0
    m2 = compute_valid_mask((10, 12), H)
    assert (m2 > 0.5).mean() < 0.8


# ------------------------------------------------------------------ view selection

def test_spiral_path_poses_orthonormal():
    poses = sphere_poses(5, 2.0, seed=0)
    path = render_path_spiral(poses[0], np.array([0, 1, 0.0]),
                              rads=[0.2, 0.2, 0.2], focal=1.0, zrate=0.5,
                              rots=2, N=12)
    assert len(path) == 12
    for p in path:
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)


def test_generate_and_perturb_render_pose():
    rng = np.random.default_rng(0)
    poses = sphere_poses(6, 2.0, seed=1)
    path = generate_render_pose(poses, np.array([0.5, 3.0]), rng=rng)
    assert len(path) == 120
    new, idx = perturb_render_pose(poses, x=0.1, angle=5.0, rng=rng)
    assert new.shape == (10, 3, 4) and 0 <= idx < 6


def test_frustum_overlap_self_is_full():
    K, frustum, W, H = camera_frustum_initializer([0.0, 2.0], sample_step=0.3)
    pose = np.eye(4)[:3]
    assert compute_frustums_overlap(pose, pose, frustum, K, W, H) == pytest.approx(1.0)
    # a far-translated camera sees (almost) none of it
    moved = pose.copy()
    moved[:3, 3] = [10.0, 0.0, 0.0]
    assert compute_frustums_overlap(pose, moved, frustum, K, W, H) < 0.2


def test_unique_view_selection_and_overlap_removal():
    poses = np.stack([np.eye(4)[:3]] * 4)  # identical views
    # all identical → one unique view
    idx = fetch_unique_view_index(poses, threshold=0.5, near_far=[0.0, 1.5])
    assert len(idx) == 1

    scene = make_synthetic_scene(n_train=4, n_val=4, H=8, W=8, seed=0)
    scene.val.gt_idx = np.array([0, 1, 2, 3])
    scene.train.gt_idx = np.array([1, 3, 5, 7])
    _, val = remove_overlap_data(scene.train, scene.val)
    np.testing.assert_array_equal(val.gt_idx, [0, 2])
    assert val.images.shape[0] == 2


def test_metrics_logger(tmp_path):
    from dfnet_tpu.utils.metrics_logger import MetricsLogger

    m = MetricsLogger(str(tmp_path))
    m.log(0, loss=1.5, psnr=20.0)
    m.log(1, loss=1.2, psnr=21.0, note="rvs")
    recs = m.read()
    assert len(recs) == 2
    assert recs[0]["loss"] == 1.5 and recs[1]["note"] == "rvs"


def test_conv_autoencoder():
    import jax
    import jax.numpy as jnp

    from dfnet_tpu.models.autoencoder import (
        ConvAutoencoderConfig, autoencoder_forward, init_autoencoder_params)

    params = init_autoencoder_params(jax.random.PRNGKey(0),
                                     ConvAutoencoderConfig(widths=(8, 16)))
    x = jnp.ones((2, 16, 16, 3)) * 0.3
    recon, feats = autoencoder_forward(params, x, return_features=True)
    assert recon.shape == (2, 16, 16, 3)
    assert feats.shape == (2, 4, 4, 16)
    assert (np.asarray(recon) >= 0).all() and (np.asarray(recon) <= 1).all()


def test_step_timer_and_trace():
    import time as _time

    from dfnet_tpu.utils.profiling import StepTimer, device_trace

    t = StepTimer()
    for _ in range(3):
        with t.step():
            _time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3 and s["mean_ms"] >= 8
    with device_trace(None):
        pass  # no-op path
