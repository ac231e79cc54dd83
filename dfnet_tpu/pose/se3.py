"""SE(3) / pose utilities: averaging, centering, dataset coordinate fixes,
perturbation, quaternion error metrics, rotation projection.

Functional parity targets (reference file:line):
  - average_poses / center_poses        /root/reference/dataset_loaders/load_7Scenes.py:138-197
  - fix_coord (7-Scenes LLFF flip)      load_7Scenes.py:279-344
  - fix_coord (Cambridge rot180+mirror) load_Cambridge.py:277-347
  - fix_coord_supp world rescale        /root/reference/script/dm/direct_pose_model.py:147-167
  - rot_phi/theta/psi + perturbation    /root/reference/script/feature/misc.py:22-47,437-483
  - quaternion angular error            /root/reference/script/dm/pose_model.py:79-159
  - SVD rotation projection             /root/reference/script/feature/direct_feature_matching.py:88-93

Data-prep functions are numpy (host-side, once per run); the rotation
projection also has a jnp variant because it sits inside jitted train
steps (stage-3 gradients flow through it).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# elementary rotations (4x4 homogeneous), angles in radians
# ---------------------------------------------------------------------------

def rot_phi(phi: float) -> np.ndarray:
    """Rotation about the x axis."""
    c, s = np.cos(phi), np.sin(phi)
    m = np.eye(4)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def rot_theta(th: float) -> np.ndarray:
    """Rotation about the y axis (reference's convention: [[c,0,-s],[0,1,0],[s,0,c]])."""
    c, s = np.cos(th), np.sin(th)
    m = np.eye(4)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, -s, s, c
    return m


def rot_psi(psi: float) -> np.ndarray:
    """Rotation about the z axis."""
    c, s = np.cos(psi), np.sin(psi)
    m = np.eye(4)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return m


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


# ---------------------------------------------------------------------------
# pose averaging / centering
# ---------------------------------------------------------------------------

def average_poses(poses: np.ndarray) -> np.ndarray:
    """Average camera pose of a set of (N,3,4) c2w matrices.

    center = mean of centers; z = normalized mean z axis; x = y'×z
    normalized with y' the mean y axis; y = z×x.
    """
    center = poses[..., 3].mean(0)
    z = _normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = _normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)  # (3,4)


def center_poses(poses: np.ndarray, pose_avg: np.ndarray | None = None):
    """Transform all poses into the average pose's frame.

    Returns (poses_centered (N,3,4), pose_avg (3,4)).
    """
    if pose_avg is None:
        pose_avg = average_poses(poses)
    avg_homo = np.eye(4)
    avg_homo[:3] = pose_avg
    last = np.tile(np.array([0.0, 0.0, 0.0, 1.0]), (len(poses), 1, 1))
    poses_homo = np.concatenate([poses, last], 1)  # (N,4,4)
    centered = (np.linalg.inv(avg_homo) @ poses_homo)[:, :3]
    return centered, pose_avg


# ---------------------------------------------------------------------------
# dataset coordinate fixes
# ---------------------------------------------------------------------------

_FLIP_YZ = np.diag([1.0, -1.0, -1.0, 1.0])  # mirror y & z


def fix_coord_7scenes(poses: np.ndarray, pose_avg: np.ndarray | None = None) -> np.ndarray:
    """Center (N,3,4) 7-Scenes poses and flip y/z to the LLFF convention.

    NOTE: the reference applies M@([R|T]@M) — a one-sided association it
    flags as a bug (load_7Scenes.py:321-322) — instead of the similarity
    M@[R|T]@M.T. All released checkpoints were trained in that frame,
    so we reproduce it exactly for parity.
    """
    centered, _ = center_poses(poses, pose_avg)
    last = np.tile(np.array([0.0, 0.0, 0.0, 1.0]), (len(centered), 1, 1))
    homo = np.concatenate([centered, last], 1)
    fixed = _FLIP_YZ[None] @ (homo @ _FLIP_YZ[None])
    return fixed[:, :3, :4]


def fix_coord_cambridge(poses: np.ndarray, pose_avg: np.ndarray | None = None) -> np.ndarray:
    """Center Cambridge poses, rotate 180° about x, negate the rotation
    block, then mirror the rotation about the x axis (R' = R @ diag(-1,1,1))."""
    centered, _ = center_poses(poses, pose_avg)
    last = np.tile(np.array([0.0, 0.0, 0.0, 1.0]), (len(centered), 1, 1))
    homo = np.concatenate([centered, last], 1)
    homo = rot_phi(np.pi)[None] @ homo
    homo[:, :3, :3] = -homo[:, :3, :3]
    homo[:, :3, :3] = homo[:, :3, :3] @ np.diag([-1.0, 1.0, 1.0])
    return homo[:, :3, :4]


def rescale_poses_to_nerf(poses, pose_scale: float, move_all_cam_vec, pose_scale2: float):
    """Apply the per-scene world_setup rescale: t*=scale; t+=move; t*=scale2.

    Works for numpy or jnp arrays of shape (...,3,4); used both at data
    prep (rescale_coord=True path) and inside jitted stage-3 steps on
    the predicted pose (the fix_coord_supp equivalent).
    """
    xp = jnp if isinstance(poses, jnp.ndarray) else np
    move = xp.asarray(move_all_cam_vec, dtype=poses.dtype)
    t = poses[..., :3, 3] * pose_scale
    t = (t + move) * pose_scale2
    if xp is jnp:
        return poses.at[..., :3, 3].set(t)
    out = poses.copy()
    out[..., :3, 3] = t
    return out


# ---------------------------------------------------------------------------
# pose perturbation (Random View Synthesis)
# ---------------------------------------------------------------------------

def perturb_rotation(c2w: np.ndarray, theta: float, phi: float, psi: float = 0.0) -> np.ndarray:
    """Left-multiply a (3,4) pose by world-frame x/y/z rotations (degrees)."""
    homo = np.concatenate([c2w, np.array([[0.0, 0.0, 0.0, 1.0]])], 0)
    homo = rot_phi(phi / 180.0 * np.pi) @ homo
    homo = rot_theta(theta / 180.0 * np.pi) @ homo
    homo = rot_psi(psi / 180.0 * np.pi) @ homo
    return homo[:3, :4]


def perturb_single_render_pose(pose: np.ndarray, x: float, angle: float,
                               rng: np.random.Generator | None = None) -> np.ndarray:
    """RVS perturbation: random world-frame rotation of up to ±angle deg
    per axis, then ±x translation per axis; translation is preserved
    through the rotation step (rotation applies to orientation only here,
    matching misc.py:448-483)."""
    rng = rng or np.random.default_rng()
    new = pose.copy()
    loc = new[:, 3].copy()
    theta, phi, psi = rng.uniform(-angle, angle, 3)
    new = perturb_rotation(new, theta, phi, psi)
    new[:, 3] = loc + rng.uniform(-x, x, 3)
    return new


# ---------------------------------------------------------------------------
# quaternions & error metrics
# ---------------------------------------------------------------------------

def mat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix (...,3,3) → unit quaternion (...,4) wxyz, w>=0 not enforced.

    Shepperd's method (numerically stable across all traces).
    """
    R = np.asarray(R, dtype=np.float64)
    batch = R.shape[:-2]
    R = R.reshape(-1, 3, 3)
    q = np.empty((R.shape[0], 4))
    for i, m in enumerate(R):
        t = np.trace(m)
        if t > 0:
            r = np.sqrt(1.0 + t)
            s = 0.5 / r
            q[i] = [0.5 * r, (m[2, 1] - m[1, 2]) * s,
                    (m[0, 2] - m[2, 0]) * s, (m[1, 0] - m[0, 1]) * s]
        else:
            k = np.argmax(np.diag(m))
            if k == 0:
                r = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2])
                s = 0.5 / r
                q[i] = [(m[2, 1] - m[1, 2]) * s, 0.5 * r,
                        (m[0, 1] + m[1, 0]) * s, (m[0, 2] + m[2, 0]) * s]
            elif k == 1:
                r = np.sqrt(1.0 - m[0, 0] + m[1, 1] - m[2, 2])
                s = 0.5 / r
                q[i] = [(m[0, 2] - m[2, 0]) * s, (m[0, 1] + m[1, 0]) * s,
                        0.5 * r, (m[1, 2] + m[2, 1]) * s]
            else:
                r = np.sqrt(1.0 - m[0, 0] - m[1, 1] + m[2, 2])
                s = 0.5 / r
                q[i] = [(m[1, 0] - m[0, 1]) * s, (m[0, 2] + m[2, 0]) * s,
                        (m[1, 2] + m[2, 1]) * s, 0.5 * r]
    return q.reshape(*batch, 4)


def pose_errors(pred: np.ndarray, gt: np.ndarray):
    """Per-sample translation (m) and rotation (deg) error.

    pred/gt: (N,3,4). Rotation error = 2·acos(|q_pred·q_gt|)·180/π, the
    canonical APR metric (dm/pose_model.py:136-141).
    """
    q1 = mat_to_quat(gt[:, :3, :3])
    q2 = mat_to_quat(pred[:, :3, :3])
    q1 = q1 / np.linalg.norm(q1, axis=-1, keepdims=True)
    q2 = q2 / np.linalg.norm(q2, axis=-1, keepdims=True)
    d = np.clip(np.abs(np.sum(q1 * q2, -1)), -1.0, 1.0)
    theta = 2.0 * np.degrees(np.arccos(d))
    t_err = np.linalg.norm(gt[:, :3, 3] - pred[:, :3, 3], axis=-1)
    return t_err, theta


def project_rotation_svd(pose):
    """Project the (...,3,3) rotation block of a (...,3,4) jnp pose onto
    SO(3)-ish via SVD: R <- U V^T (no det correction, matching the
    reference's torch.svd usage). Differentiable; used inside stage-3
    jitted steps (svd_reg)."""
    R = pose[..., :3, :3]
    u, _, vt = jnp.linalg.svd(R, full_matrices=False)
    Rs = u @ vt
    return pose.at[..., :3, :3].set(Rs)


def project_rotation_svd_np(pose: np.ndarray) -> np.ndarray:
    out = np.array(pose, copy=True)
    u, _, vt = np.linalg.svd(out[..., :3, :3])
    out[..., :3, :3] = u @ vt
    return out
