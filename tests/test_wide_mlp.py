"""Wide-MLP (W=256) support in the fused kernels — CPU interpret-mode
parity against the XLA paths.

W beyond one 128-lane tile exercises the tall per-ray conditioning
tiles (nk.dpt_tiles_of rows = W) and the halved point tiles
(nk.fine_tile_target W argument). Reference semantics unchanged:
/root/reference/script/models/nerfw.py:220-354 at netwidth 256
(options.py:30-33 leaves the reference at 128; QUALITY.md round 4
measured +1.47 dB from the extra width on the synthetic scene).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfnet_tpu.config import parse_args
from dfnet_tpu.models.factory import create_nerfh, render_settings
from dfnet_tpu.models.losses import nerfw_loss
from dfnet_tpu.models.nerfw import lookup_hist_embedding, nerfw_apply_rays
from dfnet_tpu.ops import nerf_kernels as nk
from dfnet_tpu.render.fused_train import (fused_train_supported,
                                          render_rays_train_fused,
                                          train_ray_align)
from dfnet_tpu.render.volume import render_rays


@pytest.fixture(scope="module")
def wide():
    # D=4 keeps CPU interpret mode affordable; the wide-specific code
    # paths are width-driven, not depth-driven
    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--netdepth", "4", "--netwidth", "256", "--netdepth_fine", "4",
        "--netwidth_fine", "256", "--N_samples", "16", "--N_importance",
        "16", "--precision", "bf16",
    ], stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def test_wide_fine_kernel_matches_xla_mlp(wide):
    cfg, model, params = wide
    cfgf = model.cfg_fine
    assert cfgf.W == 256
    S = 16
    N = nk.ray_tile(S, cfgf.W)
    ro = jax.random.normal(jax.random.PRNGKey(1), (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    z = jnp.sort(jax.random.uniform(jax.random.PRNGKey(3), (N, S)) * 2.0, -1)
    hist = jax.random.randint(jax.random.PRNGKey(4), (N, cfg.hist_bin), 0, 10)

    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    dir_emb = model.embed_dir(rd)
    a_emb = lookup_hist_embedding(params["embedding_a"], hist)
    t_emb = lookup_hist_embedding(params["embedding_t"], hist)
    want = np.asarray(nerfw_apply_rays(
        params["fine"], cfgf, model.embed_xyz(pts), dir_emb, a_emb, t_emb,
        output_transient=True))

    packed = nk.pack_fine_t(params["fine"], cfgf, model.embed_xyz)
    assert packed["w0"].shape[0] == 256
    spec = nk.KernelSpec(D=cfgf.D, skip=cfgf.skips[0],
                         F=model.embed_xyz.num_freqs, fine=True)
    dpt = nk.per_ray_row(params["fine"], cfgf, dir_emb, a_emb, t_emb)
    assert dpt.shape[-1] == 256            # tall conditioning rows
    raw16 = nk.fine_raw_t(packed, ro, rd, z, dpt, spec, interpret=True)
    got = np.stack([
        jax.nn.sigmoid(raw16[0]), jax.nn.sigmoid(raw16[1]),
        jax.nn.sigmoid(raw16[2]), jax.nn.softplus(raw16[3]),
        jax.nn.sigmoid(raw16[4]), jax.nn.sigmoid(raw16[5]),
        jax.nn.sigmoid(raw16[6]), jax.nn.softplus(raw16[7]),
        jax.nn.softplus(raw16[8]),
    ], -1)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_wide_fused_train_parity(wide):
    import dfnet_tpu.render.fused_train as ft

    cfg, model, params = wide
    settings = render_settings(cfg, 0.5, 3.5)
    n = train_ray_align(settings, 256)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    ro = jax.random.normal(k1, (n, 3)) * 0.1
    rd = jax.random.normal(k2, (n, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    hist = jnp.zeros((n, cfg.hist_bin), jnp.int32)
    target = jax.random.uniform(k3, (n, 3))
    rng = jax.random.PRNGKey(7)

    old = ft.ALLOW_INTERPRET_TRAIN
    ft.ALLOW_INTERPRET_TRAIN = True
    try:
        assert fused_train_supported(model, settings, n)
        ref = render_rays(params, model, ro, rd, hist, settings, rng)
        fused = render_rays_train_fused(params, model, ro, rd, hist,
                                        settings, rng)
        for k in ("rgb0", "rgb", "beta"):
            a, b = np.asarray(ref[k]), np.asarray(fused[k])
            assert np.allclose(a, b, atol=5e-3), (
                f"{k}: max err {np.abs(a - b).max()}")

        def loss_ref(p):
            out = render_rays(p, model, ro, rd, hist, settings, rng)
            return sum(nerfw_loss(out, target).values())

        def loss_fused(p):
            out = render_rays_train_fused(p, model, ro, rd, hist, settings,
                                          rng)
            return sum(nerfw_loss(out, target).values())

        lr, gr = jax.value_and_grad(loss_ref)(params)
        lf, gf = jax.value_and_grad(loss_fused)(params)
        assert np.allclose(float(lr), float(lf), rtol=1e-3)
        flat_f = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(gf)}
        checked = 0
        for key, vr in jax.tree_util.tree_leaves_with_path(gr):
            ks = jax.tree_util.keystr(key)
            if ks.startswith("['proposal']"):
                continue
            vf = flat_f[ks]
            vr = np.asarray(vr, np.float64)
            vf = np.asarray(vf, np.float64)
            # 5e-2 (vs 3e-2 at W=32 in test_fused_train): the fused
            # backward casts cotangents to bf16 between layers, and the
            # 2x-wider dt stream accumulates proportionally more of that
            # rounding into the conditioning-row (embedding) grads.
            # (An hi/lo cotangent split tightening this to 3.2e-2 was
            # probed and closed: no trained-quality recovery at 2.6x
            # train cost — QUALITY.md round-4 frontier.)
            # Absolute floor 1e-6: near-zero leaves (e.g. the coarse
            # sigma bias at random init) sit at bf16 cancellation noise.
            scale = max(np.abs(vr).max(), np.abs(vf).max(), 1e-6)
            assert np.abs(vr - vf).max() < 5e-2 * scale + 1e-6, (
                f"{ks}: abs err {np.abs(vr - vf).max():.2e}")
            checked += 1
        assert checked >= 15
    finally:
        ft.ALLOW_INTERPRET_TRAIN = old


def test_wide_render_rays_fast_matches_xla(wide):
    import dfnet_tpu.render.fast as fast_mod
    from dfnet_tpu.render.fast import (FastNeRFH, fast_path_supported,
                                       render_rays_fast)

    cfg, model, params = wide
    settings = render_settings(cfg, 0.5, 3.5, test=True)
    assert not fast_path_supported(model, settings)   # CPU gate
    old = fast_mod.ALLOW_INTERPRET_PATH
    fast_mod.ALLOW_INTERPRET_PATH = True
    try:
        assert fast_path_supported(model, settings)
        fast = FastNeRFH.pack(params, model)
        n = fast.ray_align(settings)
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        ro = jax.random.normal(k1, (n, 3)) * 0.1
        rd = jax.random.normal(k2, (n, 3))
        rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
        hist = jnp.zeros((n, cfg.hist_bin), jnp.int32)
        ref = render_rays(params, model, ro, rd, hist, settings)
        got = render_rays_fast(fast, ro, rd, hist, settings,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got["rgb"]),
                                   np.asarray(ref["rgb"]), atol=2e-2)
    finally:
        fast_mod.ALLOW_INTERPRET_PATH = old
