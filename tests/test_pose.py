import numpy as np
import pytest

from dfnet_tpu.pose import (
    average_poses, center_poses, fix_coord_7scenes, fix_coord_cambridge,
    rescale_poses_to_nerf, rot_phi, rot_theta, rot_psi,
    perturb_rotation, perturb_single_render_pose, mat_to_quat, pose_errors,
    project_rotation_svd, project_rotation_svd_np,
)


def random_rotation(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def random_poses(n, rng):
    poses = np.zeros((n, 3, 4))
    for i in range(n):
        poses[i, :3, :3] = random_rotation(rng)
        poses[i, :3, 3] = rng.normal(size=3)
    return poses


def test_rot_matrices_orthonormal():
    for rot in (rot_phi, rot_theta, rot_psi):
        m = rot(0.7)[:3, :3]
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(m), 1.0)


def test_rot_theta_convention():
    # reference uses [[c,0,-s],[0,1,0],[s,0,c]] for y-rotation (misc.py:36-40)
    m = rot_theta(np.pi / 2)
    np.testing.assert_allclose(m[:3, :3], [[0, 0, -1], [0, 1, 0], [1, 0, 0]], atol=1e-12)


def test_average_poses_identity_cluster():
    rng = np.random.default_rng(0)
    base = random_poses(1, rng)[0]
    poses = np.stack([base] * 5)
    avg = average_poses(poses)
    np.testing.assert_allclose(avg, base, atol=1e-10)


def test_center_poses_roundtrip():
    rng = np.random.default_rng(1)
    poses = random_poses(8, rng)
    centered, pose_avg = center_poses(poses)
    # re-applying the average transform recovers the originals
    avg_homo = np.eye(4)
    avg_homo[:3] = pose_avg
    last = np.tile([0, 0, 0, 1.0], (8, 1, 1))
    rec = (avg_homo @ np.concatenate([centered, last], 1))[:, :3]
    np.testing.assert_allclose(rec, poses, atol=1e-10)
    # average of centered poses is identity
    np.testing.assert_allclose(average_poses(centered), np.eye(4)[:3], atol=1e-8)


def test_fix_coord_7scenes_matches_manual_flip():
    rng = np.random.default_rng(2)
    poses = random_poses(4, rng)
    centered, _ = center_poses(poses)
    M = np.diag([1.0, -1.0, -1.0, 1.0])
    last = np.tile([0, 0, 0, 1.0], (4, 1, 1))
    homo = np.concatenate([centered, last], 1)
    expect = (M[None] @ (homo @ M[None]))[:, :3, :4]
    got = fix_coord_7scenes(poses)
    np.testing.assert_allclose(got, expect, atol=1e-10)


def test_fix_coord_7scenes_with_loaded_avg():
    rng = np.random.default_rng(3)
    poses = random_poses(6, rng)
    avg = average_poses(poses)
    a = fix_coord_7scenes(poses, pose_avg=avg)
    b = fix_coord_7scenes(poses)
    np.testing.assert_allclose(a, b, atol=1e-10)


def test_fix_coord_cambridge_rotation_still_orthonormal():
    rng = np.random.default_rng(4)
    poses = random_poses(5, rng)
    fixed = fix_coord_cambridge(poses)
    for p in fixed:
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)


def test_rescale_poses_numpy_and_jnp_agree():
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    poses = random_poses(3, rng).astype(np.float32)
    out_np = rescale_poses_to_nerf(poses, 2.0, [0.1, -0.2, 0.3], 0.5)
    out_j = rescale_poses_to_nerf(jnp.asarray(poses), 2.0, [0.1, -0.2, 0.3], 0.5)
    np.testing.assert_allclose(out_np, np.asarray(out_j), atol=1e-6)
    # rotation untouched
    np.testing.assert_allclose(out_np[:, :3, :3], poses[:, :3, :3])
    # translation formula
    np.testing.assert_allclose(
        out_np[0, :3, 3], (poses[0, :3, 3] * 2.0 + [0.1, -0.2, 0.3]) * 0.5, atol=1e-6)


def test_perturb_rotation_zero_is_identity():
    rng = np.random.default_rng(6)
    pose = random_poses(1, rng)[0]
    np.testing.assert_allclose(perturb_rotation(pose, 0, 0, 0), pose, atol=1e-12)


def test_perturb_single_render_pose_bounds():
    rng = np.random.default_rng(7)
    pose = random_poses(1, rng)[0]
    new = perturb_single_render_pose(pose, x=0.5, angle=10.0, rng=rng)
    assert new.shape == (3, 4)
    assert np.all(np.abs(new[:, 3] - pose[:, 3]) <= 0.5 + 1e-9)
    R = new[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)


def test_mat_to_quat_known_rotations():
    # identity → (1,0,0,0)
    np.testing.assert_allclose(mat_to_quat(np.eye(3)), [1, 0, 0, 0], atol=1e-12)
    # 90° about z → (cos45, 0, 0, sin45)
    q = mat_to_quat(rot_psi(np.pi / 2)[:3, :3])
    np.testing.assert_allclose(np.abs(q), [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], atol=1e-12)
    # trace<0 branch: 180° about x
    q = mat_to_quat(rot_phi(np.pi)[:3, :3])
    np.testing.assert_allclose(np.abs(q), [0, 1, 0, 0], atol=1e-7)


def test_pose_errors_exact_angles():
    rng = np.random.default_rng(8)
    gt = random_poses(3, rng)
    pred = gt.copy()
    ang = 17.0
    pred[0] = perturb_rotation(gt[0].copy(), ang, 0, 0)
    pred[0][:, 3] = gt[0][:, 3]  # translation unchanged
    pred[1][:, 3] += [0.3, 0.4, 0.0]  # 0.5 m
    t_err, r_err = pose_errors(pred, gt)
    assert np.isclose(r_err[0], ang, atol=1e-5)
    assert np.isclose(t_err[0], 0.0, atol=1e-9)
    assert np.isclose(t_err[1], 0.5, atol=1e-9)
    assert np.isclose(r_err[2], 0.0, atol=1e-4)


def test_project_rotation_svd():
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    pose = random_poses(2, rng).astype(np.float32)
    noisy = pose.copy()
    noisy[..., :3, :3] += 0.05 * rng.normal(size=(2, 3, 3))
    out_np = project_rotation_svd_np(noisy)
    out_j = np.asarray(project_rotation_svd(jnp.asarray(noisy)))
    # f32 SVD: orthonormal to within single precision
    for o in (out_np, out_j):
        for R in o[..., :3, :3]:
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=2e-3)
    # translations untouched
    np.testing.assert_allclose(out_np[..., 3], noisy[..., 3])
