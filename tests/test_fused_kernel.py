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
    RAY_TILE, fused_coarse_sigma, fused_fine_raw, pack_fused_params,
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
    n, S = 2 * RAY_TILE, 16
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
    got = fused_fine_raw(packed, rays_o, rays_d, z, dp, tp, interpret=True)
    assert got.shape == (n, S, 9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05, rtol=0.05)
    # the high-dynamic-range channels (sigmas) should correlate strongly
    r = np.corrcoef(np.asarray(got[..., 3]).ravel(),
                    np.asarray(ref[..., 3]).ravel())[0, 1]
    assert r > 0.999


def test_fused_coarse_matches_xla():
    emb_xyz, emb_dir, cfg, params = setup(fine=False)
    n, S = RAY_TILE, 8
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    rays_o = jax.random.normal(ks[0], (n, 3)) * 0.1
    rays_d = jax.random.normal(ks[1], (n, 3))
    z = jnp.sort(jax.random.uniform(ks[2], (n, S), minval=0.2, maxval=3.0), -1)

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    ref = nerfw_apply_rays(params, cfg, emb_xyz(pts), sigma_only=True)

    packed = pack_fused_params(params, cfg, emb_xyz, fine=False)
    got = fused_coarse_sigma(packed, rays_o, rays_d, z, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05, rtol=0.05)
