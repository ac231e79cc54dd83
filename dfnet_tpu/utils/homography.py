"""Homography augmentation suite: random homography sampling, point
warping, inverse image warping, and valid-region masks.

Functional parity: /root/reference/script/utils/utils.py:125-331
(sample_homography_np / warp_points / inv_warp_image_batch /
compute_valid_mask — SuperPoint-style augmentation; present in the
reference but unused by its entry points). Sampling is host-side numpy;
warping is jnp (NHWC, grid_sample-equivalent bilinear with
align_corners=True and zero padding).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _get_perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography mapping 4 src points to 4 dst points
    (cv2.getPerspectiveTransform equivalent, solved as an 8x8 system)."""
    A = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        A[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(A, b)
    return np.concatenate([h, [1.0]]).reshape(3, 3)


def sample_homography_np(
    shape, shift=0, perspective=True, scaling=True, rotation=True,
    translation=True, n_scales=5, n_angles=25, scaling_amplitude=0.1,
    perspective_amplitude_x=0.1, perspective_amplitude_y=0.1,
    patch_ratio=0.5, max_angle=np.pi / 2, allow_artifacts=False,
    translation_overflow=0.0, rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Random valid homography between a centered patch and a perturbed
    (perspective/scale/rotation/translation) projection of it."""
    rng = rng or np.random.default_rng()
    pts1 = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
    margin = (1 - patch_ratio) / 2
    pts2 = margin + np.array([[0, 0], [0, patch_ratio],
                              [patch_ratio, patch_ratio], [patch_ratio, 0]])

    def trunc_normal(scale, size=1):
        # truncated normal in ±2σ
        out = rng.normal(0.0, scale, size)
        return np.clip(out, -2 * scale, 2 * scale)

    if perspective:
        if not allow_artifacts:
            perspective_amplitude_x = min(perspective_amplitude_x, margin)
            perspective_amplitude_y = min(perspective_amplitude_y, margin)
        pd = trunc_normal(perspective_amplitude_y / 2)
        hl = trunc_normal(perspective_amplitude_x / 2)
        hr = trunc_normal(perspective_amplitude_x / 2)
        pts2 += np.array([[hl, pd], [hl, -pd], [hr, pd], [hr, -pd]]).squeeze(-1)

    if scaling:
        scales = np.concatenate(
            [[1.0], 1.0 + trunc_normal(scaling_amplitude / 2, n_scales)])
        center = pts2.mean(0, keepdims=True)
        scaled = (pts2 - center)[None] * scales[:, None, None] + center
        if allow_artifacts:
            valid = np.arange(len(scales))
        else:
            ok = ((scaled >= 0.0) & (scaled < 1.0)).all((1, 2))
            valid = np.where(ok)[0]
        pts2 = scaled[rng.choice(valid)]

    if translation:
        t_min, t_max = pts2.min(0), (1 - pts2).min(0)
        if allow_artifacts:
            t_min = t_min + translation_overflow
            t_max = t_max + translation_overflow
        pts2 += np.array([rng.uniform(-t_min[0], t_max[0]),
                          rng.uniform(-t_min[1], t_max[1])])

    if rotation:
        angles = np.concatenate(
            [np.linspace(-max_angle, max_angle, n_angles), [0.0]])
        center = pts2.mean(0, keepdims=True)
        rot = np.stack([np.cos(angles), -np.sin(angles),
                        np.sin(angles), np.cos(angles)], 1).reshape(-1, 2, 2)
        rotated = (pts2 - center)[None] @ rot + center
        if allow_artifacts:
            valid = np.arange(n_angles)
        else:
            ok = ((rotated >= 0.0) & (rotated < 1.0)).all((1, 2))
            valid = np.where(ok)[0]
        pts2 = rotated[rng.choice(valid)]

    shape = np.array(shape)[::-1]  # [y, x] → [x, y]
    pts1 = pts1 * shape[None]
    pts2 = pts2 * shape[None]
    return _get_perspective_transform(
        (pts1 + shift).astype(np.float32), (pts2 + shift).astype(np.float32))


def warp_points(points, homographies):
    """points (N,2 xy) warped by homographies (3,3) or (B,3,3) →
    (N,2) or (B,N,2)."""
    H = jnp.asarray(homographies)
    no_batch = H.ndim == 2
    H = H[None] if no_batch else H
    pts = jnp.concatenate(
        [jnp.asarray(points, jnp.float32),
         jnp.ones((points.shape[0], 1), jnp.float32)], 1)
    warped = jnp.einsum("bij,nj->bni", H, pts)
    warped = warped[..., :2] / warped[..., 2:]
    return warped[0] if no_batch else warped


def _grid_sample_bilinear(img, coords):
    """img (B,H,W,C); coords (B,H,W,2) in [-1,1] (x,y), align_corners=True,
    zeros padding — torch F.grid_sample equivalent."""
    B, H, W, C = img.shape
    x = (coords[..., 0] + 1.0) * (W - 1) / 2.0
    y = (coords[..., 1] + 1.0) * (H - 1) / 2.0
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1

    def gather(yy, xx):
        yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        valid = ((yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1))
        out = jnp.take_along_axis(
            img.reshape(B, H * W, C),
            (yi * W + xi).reshape(B, -1, 1), axis=1).reshape(B, *yy.shape[1:], C)
        return out * valid[..., None]

    wa = (x1 - x) * (y1 - y)
    wb = (x1 - x) * (y - y0)
    wc = (x - x0) * (y1 - y)
    wd = (x - x0) * (y - y0)
    return (gather(y0, x0) * wa[..., None] + gather(y1, x0) * wb[..., None]
            + gather(y0, x1) * wc[..., None] + gather(y1, x1) * wd[..., None])


def inv_warp_image_batch(img, mat_homo_inv, mode: str = "bilinear"):
    """img (B,H,W,C) [or (H,W)/(H,W,C)]; mat_homo_inv (B,3,3) or (3,3).
    Returns the inverse-warped batch."""
    img = jnp.asarray(img, jnp.float32)
    if img.ndim == 2:
        img = img[None, ..., None]
    elif img.ndim == 3:
        img = img[None]
    H_mat = jnp.asarray(mat_homo_inv, jnp.float32)
    if H_mat.ndim == 2:
        H_mat = H_mat[None]
    B, H, W, C = img.shape
    xs = jnp.linspace(-1, 1, W)
    ys = jnp.linspace(-1, 1, H)
    gx, gy = jnp.meshgrid(xs, ys)                     # (H,W)
    cells = jnp.stack([gx, gy], -1).reshape(-1, 2)    # (H*W, 2) xy
    src = warp_points(cells, H_mat)                   # (B,H*W,2)
    src = src.reshape(B, H, W, 2)
    if mode == "nearest":
        src = jnp.round(src * jnp.array([(W - 1) / 2, (H - 1) / 2])) / jnp.array(
            [(W - 1) / 2, (H - 1) / 2])
    return _grid_sample_bilinear(img, src)


def compute_valid_mask(image_shape, inv_homography, erosion_radius: int = 0):
    """Boolean mask of non-border pixels after warping (B,H,W)."""
    Hm = jnp.asarray(inv_homography, jnp.float32)
    if Hm.ndim == 2:
        Hm = Hm[None]
    B = Hm.shape[0]
    ones = jnp.ones((B, image_shape[0], image_shape[1], 1))
    mask = inv_warp_image_batch(ones, Hm, mode="nearest")[..., 0]
    mask = np.asarray(mask)
    if erosion_radius > 0:
        import cv2

        kernel = cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (erosion_radius * 2,) * 2)
        for i in range(B):
            mask[i] = cv2.erode(mask[i], kernel, iterations=1)
    return mask
