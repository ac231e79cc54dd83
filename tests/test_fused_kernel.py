"""Fused Pallas kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfnet_tpu.models.embedder import get_embedder
from dfnet_tpu.models.nerfw import (
    NeRFWConfig, init_nerfw_params, nerfw_apply_rays,
)
from dfnet_tpu.ops.fused_nerfw import (
    POINT_TILE, fused_coarse_sigma, fused_fine_raw, pack_fused_params,
    per_ray_partials,
)


def setup(fine=True):
    emb_xyz = get_embedder(10)
    emb_dir = get_embedder(4)
    cfg = NeRFWConfig(D=8, W=128, in_xyz=63, in_dir=27, in_a=50, in_t=20,
                      encode_appearance=fine, encode_transient=fine,
                      compute_dtype=jnp.bfloat16)
    params = init_nerfw_params(jax.random.PRNGKey(0), cfg)
    return emb_xyz, emb_dir, cfg, params


def test_fused_fine_matches_xla():
    emb_xyz, emb_dir, cfg, params = setup(fine=True)
    n, S = POINT_TILE // 16, 16  # n*S = POINT_TILE points
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    rays_o = jax.random.normal(ks[0], (n, 3)) * 0.1
    rays_d = jax.random.normal(ks[1], (n, 3))
    z = jnp.sort(jax.random.uniform(ks[2], (n, S), minval=0.2, maxval=3.0), -1)
    dir_emb = emb_dir(rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True))
    a_emb = jax.random.normal(ks[3], (n, 50))
    t_emb = jax.random.normal(ks[4], (n, 20))

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    ref = nerfw_apply_rays(params, cfg, emb_xyz(pts), dir_emb, a_emb, t_emb,
                           output_transient=True)

    packed = pack_fused_params(params, cfg, emb_xyz, fine=True)
    dp, tp = per_ray_partials(params, cfg, dir_emb, a_emb, t_emb)
    pts_flat = pts.reshape(-1, 3)
    dp_pts = jnp.repeat(dp, S, axis=0)
    tp_pts = jnp.repeat(tp, S, axis=0)
    got = fused_fine_raw(packed, pts_flat, dp_pts, tp_pts, interpret=True)
    assert got.shape == (n * S, 9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref).reshape(-1, 9),
                               atol=0.05, rtol=0.05)
    r = np.corrcoef(np.asarray(got[:, 3]).ravel(),
                    np.asarray(ref[..., 3]).ravel())[0, 1]
    assert r > 0.999


def test_fused_coarse_matches_xla():
    emb_xyz, emb_dir, cfg, params = setup(fine=False)
    n, S = POINT_TILE // 8, 8
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    rays_o = jax.random.normal(ks[0], (n, 3)) * 0.1
    rays_d = jax.random.normal(ks[1], (n, 3))
    z = jnp.sort(jax.random.uniform(ks[2], (n, S), minval=0.2, maxval=3.0), -1)

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    ref = nerfw_apply_rays(params, cfg, emb_xyz(pts), sigma_only=True)

    packed = pack_fused_params(params, cfg, emb_xyz, fine=False)
    got = fused_coarse_sigma(packed, pts.reshape(-1, 3), interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref).reshape(-1, 1),
                               atol=0.05, rtol=0.05)


def test_render_rays_fused_matches_xla_path():
    from dfnet_tpu.config import parse_args
    from dfnet_tpu.models.factory import create_nerfh, render_settings
    from dfnet_tpu.render.fast import FusedNeRFH, render_rays_fused
    from dfnet_tpu.render.volume import render_rays

    cfg = parse_args(["--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
                      "--N_samples", "64", "--N_importance", "64"], stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    st = render_settings(cfg, 0.2, 3.0, test=True)

    n = 64  # 64*64 = 4096 coarse pts; 64*128 fine — both tile multiples of 2048
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    ro = jax.random.normal(ks[0], (n, 3)) * 0.1
    rd = jax.random.normal(ks[1], (n, 3))
    hist = jnp.zeros((n, 10), jnp.int32)

    ref = render_rays(params, model, ro, rd, hist, st)
    fused = FusedNeRFH.pack(params, model)
    got = render_rays_fused(fused, ro, rd, hist, st, interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(ref["rgb"]),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(got["acc"]), np.asarray(ref["acc"]),
                               atol=0.02)


def test_frozen_nerf_fused_flag_interpret():
    """--fused_render wiring: FrozenNeRF renders through the fused path
    (interpret-mode kernels on CPU) and matches the XLA path."""
    from dfnet_tpu.config import parse_args
    from dfnet_tpu.data.synthetic import make_synthetic_scene
    from dfnet_tpu.training.nerf_renderer import FrozenNeRF

    scene = make_synthetic_scene(n_train=2, n_val=1, H=16, W=16, seed=0)
    base = ["--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
            "--N_samples", "64", "--N_importance", "64", "--no_reload"]
    cfg_x = parse_args(base, stage="nerf")
    nerf_x = FrozenNeRF(cfg_x, scene.hwf, scene.near, scene.far, scene.world_setup)

    # the kernels auto-interpret on the CPU backend
    cfg_f = parse_args(base + ["--fused_render"], stage="nerf")
    nerf_f = FrozenNeRF(cfg_f, scene.hwf, scene.near, scene.far,
                        scene.world_setup)
    rgb_f = np.asarray(nerf_f.render_at_pose(scene.val.poses[0],
                                             scene.val.hists[0]))
    rgb_x = np.asarray(nerf_x.render_at_pose(scene.val.poses[0],
                                             scene.val.hists[0]))
    assert rgb_f.shape == rgb_x.shape == (16, 16, 3)
    np.testing.assert_allclose(rgb_f, rgb_x, atol=0.03)
