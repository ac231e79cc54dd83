"""Fast render path (fused transposed Pallas kernels) — CPU interpret-mode
parity against the XLA reference path.

Parity targets: models/nerfw.nerfw_apply_rays (kernel math) and
render/volume.render_rays at test settings (pipeline). Reference
semantics: /root/reference/script/models/nerfw.py:220-354,
rendering.py:245-337.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfnet_tpu.config import parse_args
from dfnet_tpu.models.factory import create_nerfh, render_settings
from dfnet_tpu.models.nerfw import lookup_hist_embedding, nerfw_apply_rays
from dfnet_tpu.ops import nerf_kernels as nk
from dfnet_tpu.render.fast import (
    FastNeRFH,
    fast_path_supported,
    render_image_fast,
    render_rays_fast,
    sample_pdf_blend,
)
from dfnet_tpu.render.volume import render_image, render_rays


@pytest.fixture(scope="module")
def nerfh():
    cfg = parse_args(["--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
                      "--precision", "bf16"], stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def test_fine_kernel_matches_xla_mlp(nerfh):
    cfg, model, params = nerfh
    cfgf = model.cfg_fine
    key = jax.random.PRNGKey(1)
    S = 64
    N = nk.ray_tile(S) * 2
    ro = jax.random.normal(key, (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    z = jnp.sort(jax.random.uniform(jax.random.PRNGKey(3), (N, S)) * 2.0, -1)
    hist = jax.random.randint(jax.random.PRNGKey(4), (N, cfg.hist_bin), 0, 10)

    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    viewdirs = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    dir_emb = model.embed_dir(viewdirs)
    a_emb = lookup_hist_embedding(params["embedding_a"], hist)
    t_emb = lookup_hist_embedding(params["embedding_t"], hist)
    want = np.asarray(nerfw_apply_rays(
        params["fine"], cfgf, model.embed_xyz(pts), dir_emb, a_emb, t_emb,
        output_transient=True))

    packed = nk.pack_fine_t(params["fine"], cfgf, model.embed_xyz)
    spec = nk.KernelSpec(D=cfgf.D, skip=cfgf.skips[0],
                         F=model.embed_xyz.num_freqs, fine=True)
    dpt = nk.per_ray_row(params["fine"], cfgf, dir_emb, a_emb, t_emb)
    raw16 = nk.fine_raw_t(packed, ro, rd, z, dpt, spec, interpret=True)
    got = np.stack([
        jax.nn.sigmoid(raw16[0]), jax.nn.sigmoid(raw16[1]),
        jax.nn.sigmoid(raw16[2]), jax.nn.softplus(raw16[3]),
        jax.nn.sigmoid(raw16[4]), jax.nn.sigmoid(raw16[5]),
        jax.nn.sigmoid(raw16[6]), jax.nn.softplus(raw16[7]),
        jax.nn.softplus(raw16[8]),
    ], -1)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_coarse_kernel_matches_xla_sigma(nerfh):
    cfg, model, params = nerfh
    cfgc = model.cfg_coarse
    S = 64
    N = nk.ray_tile(S)
    key = jax.random.PRNGKey(5)
    ro = jax.random.normal(key, (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(6), (N, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    near, far = 0.0, 2.0
    t = jnp.linspace(0.0, 1.0, S)
    z = near * (1 - t) + far * t
    z = jnp.broadcast_to(z, (N, S))
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    want = np.asarray(nerfw_apply_rays(params["coarse"], cfgc,
                                       model.embed_xyz(pts),
                                       sigma_only=True))[..., 0]
    packed = nk.pack_coarse_t(params["coarse"], cfgc, model.embed_xyz)
    spec = nk.KernelSpec(D=cfgc.D, skip=cfgc.skips[0],
                         F=model.embed_xyz.num_freqs, fine=False)
    got = np.asarray(jax.nn.softplus(
        nk.coarse_sigma_t(packed, ro, rd, spec, S, near, far,
                          interpret=True)))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_render_rays_fast_matches_render_rays(nerfh, monkeypatch):
    import dfnet_tpu.render.fast as fast_mod

    monkeypatch.setattr(fast_mod, "ALLOW_INTERPRET_PATH", True)
    cfg, model, params = nerfh
    settings = render_settings(cfg, 0.0, 2.5, test=True)
    fast = FastNeRFH.pack(params, model)
    assert fast_path_supported(model, settings)
    N = fast.ray_align(settings) * 2
    key = jax.random.PRNGKey(7)
    ro = jax.random.normal(key, (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(8), (N, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    hist = jax.random.randint(jax.random.PRNGKey(9), (N, cfg.hist_bin), 0, 10)

    want = render_rays(params, model, ro, rd, hist, settings)
    got = render_rays_fast(fast, ro, rd, hist, settings, exact_union=True,
                           interpret=True)
    for k in ("rgb", "disp", "acc", "depth"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=3e-2, rtol=3e-2)


def test_blend_sampling_sorted_and_uniform_limit():
    # uniform weights + lam=1 -> pure uniform cdf -> exact linspace
    N, M = 4, 63
    bins = jnp.broadcast_to(jnp.linspace(0.5, 2.0, M + 1), (N, M + 1))
    w = jnp.ones((N, M))
    s = np.asarray(sample_pdf_blend(bins, w, 128, lam=1.0))
    np.testing.assert_allclose(s, np.broadcast_to(
        np.linspace(0.5, 2.0, 128), (N, 128)), atol=1e-4)
    # any lam: samples sorted and inside [bins0, binsM]
    w2 = jax.random.uniform(jax.random.PRNGKey(0), (N, M)) ** 3
    s2 = np.asarray(sample_pdf_blend(bins, w2, 96, lam=1 / 3.0))
    assert (np.diff(s2, axis=-1) >= -1e-6).all()
    assert (s2 >= 0.5 - 1e-6).all() and (s2 <= 2.0 + 1e-6).all()


def test_render_image_fast_matches_render_image(nerfh):
    cfg, model, params = nerfh
    settings = render_settings(cfg, 0.0, 2.5, test=True)
    H, W, focal = 6, 8, 10.0
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0.0], [0.5]])], -1)
    hist = jnp.zeros((cfg.hist_bin,), jnp.int32)
    want = render_image(params, model, c2w, hist, H, W, focal, settings,
                        chunk=64)
    got = render_image_fast(params, model, c2w, hist, H, W, focal, settings,
                            chunk=64, interpret=True)
    for k in ("rgb", "disp", "acc"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=3e-2, rtol=3e-2)


def test_fast_path_gating(nerfh, monkeypatch):
    import dfnet_tpu.render.fast as fast_mod

    cfg, model, params = nerfh
    settings = render_settings(cfg, 0.0, 2.5, test=True)
    # CPU backend is gated off unless tests opt in
    assert not fast_path_supported(model, settings)
    monkeypatch.setattr(fast_mod, "ALLOW_INTERPRET_PATH", True)
    assert fast_path_supported(model, settings)
    # no importance -> unsupported
    import dataclasses
    assert not fast_path_supported(
        model, dataclasses.replace(settings, N_importance=0))
    # feature-field head -> unsupported
    bad = dataclasses.replace(model, cfg_fine=dataclasses.replace(
        model.cfg_fine, out_ch=131))
    assert not fast_path_supported(bad, settings)
    # lane-aligned wide widths are supported (W=256: taller conditioning
    # tiles + halved point tiles); non-128-multiples beyond LANES and
    # anything past 2*LANES (unverified VMEM) are not
    wide = dataclasses.replace(model, cfg_fine=dataclasses.replace(
        model.cfg_fine, W=256))
    assert fast_path_supported(wide, settings)
    odd = dataclasses.replace(model, cfg_fine=dataclasses.replace(
        model.cfg_fine, W=192))
    assert not fast_path_supported(odd, settings)
    huge = dataclasses.replace(model, cfg_fine=dataclasses.replace(
        model.cfg_fine, W=512))
    assert not fast_path_supported(huge, settings)


def test_mono_path_matches_blend(nerfh):
    """The mono path (in-kernel sampling + compositing) must match the
    two-kernel blended-CDF path."""
    cfg, model, params = nerfh
    settings = render_settings(cfg, 0.0, 2.5, test=True)
    fast = FastNeRFH.pack(params, model)
    assert fast.packed_proposal is not None
    N = fast.ray_align(settings) * 2
    key = jax.random.PRNGKey(11)
    ro = jax.random.normal(key, (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(12), (N, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    hist = jax.random.randint(jax.random.PRNGKey(13), (N, cfg.hist_bin), 0, 10)
    want = render_rays_fast(fast, ro, rd, hist, settings, exact_union=False,
                            mono=False, interpret=True)
    got = render_rays_fast(fast, ro, rd, hist, settings, exact_union=False,
                           mono=True, interpret=True)
    for k in ("rgb", "acc", "depth", "disp"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=3e-2, rtol=3e-2)


def test_proposal_z_rows_matches_blend_sampling(nerfh):
    """In-kernel sampling == XLA sample_pdf_blend over the proposal's
    composited weights."""
    from dfnet_tpu.models.nerfw import nerfw_apply_rays
    from dfnet_tpu.render.fast import _shifted_cumprod_lanes
    from dfnet_tpu.render.sampling import stratified_z_vals

    cfg, model, params = nerfh
    cp = model.cfg_proposal
    packed = nk.pack_coarse_t(params["proposal"], cp, model.embed_proposal)
    spec = nk.KernelSpec(D=cp.D, skip=-1, F=model.embed_proposal.num_freqs,
                         fine=False, pe_mac=True)
    S, S_f = 64, 128
    R = nk.tile_geometry(S, target=2048)[0]
    N = R * 2
    ro = jax.random.normal(jax.random.PRNGKey(1), (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    lam = S / float(S_f)
    zr = nk.proposal_z_rows(packed, ro, rd, spec, S, S_f, 0.0, 2.5, lam,
                            interpret=True)
    z_k = np.asarray(zr[0]).reshape(N, S_f)

    z_vals = stratified_z_vals(jnp.zeros((N, 1)), jnp.full((N, 1), 2.5), S,
                               None, False, 0.0)
    pts = ro[:, None, :] + rd[:, None, :] * z_vals[..., None]
    sig = nerfw_apply_rays(params["proposal"], cp, model.embed_proposal(pts),
                           sigma_only=True)[..., 0]
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = jnp.concatenate([deltas, 1e2 * jnp.ones_like(deltas[:, :1])], -1)
    alphas = 1.0 - jnp.exp(-deltas * sig)
    w = alphas * _shifted_cumprod_lanes(alphas)
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_ref = np.asarray(sample_pdf_blend(z_mid, w[..., 1:-1], S_f, lam))
    np.testing.assert_allclose(z_k, z_ref, atol=2e-3)
    assert (np.diff(z_k, axis=-1) >= -1e-5).all()


def test_trainer_and_frozen_nerf_use_fast_path(monkeypatch, tmp_path):
    """Integration: with the CPU gate lifted, NeRFTrainer eval renders and
    FrozenNeRF no-grad renders route through the fused kernels."""
    import dfnet_tpu.render.fast as fast_mod
    from dfnet_tpu.data.synthetic import make_synthetic_scene
    from dfnet_tpu.training.nerf_renderer import FrozenNeRF
    from dfnet_tpu.training.nerf_trainer import NeRFTrainer

    monkeypatch.setattr(fast_mod, "ALLOW_INTERPRET_PATH", True)
    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--netdepth", "2", "--netwidth", "16", "--netdepth_fine", "2",
        "--netwidth_fine", "16", "--N_samples", "8", "--N_importance", "8",
        "--N_rand", "32", "--basedir", str(tmp_path),
    ], stage="nerf")
    scene = make_synthetic_scene(n_train=2, n_val=1, H=8, W=8, seed=0)
    model, _ = create_nerfh(cfg, jax.random.PRNGKey(0))
    st = render_settings(cfg, scene.near, scene.far, test=True)
    assert fast_mod.fast_path_supported(model, st)
    tr = NeRFTrainer(cfg, scene)
    psnr = tr.render_split(scene.val)
    assert np.isfinite(psnr)
    nerf = FrozenNeRF(cfg, scene.hwf, scene.near, scene.far,
                      scene.world_setup, params=tr.params, model=tr.model)
    rgb = np.asarray(nerf.render_at_pose(scene.val.poses[0],
                                         scene.val.hists[0]))
    assert rgb.shape[-1] == 3 and np.isfinite(rgb).all()


def test_sharded_render_uses_fast_path_on_mesh(monkeypatch):
    """render_image_sharded + fused kernels agree with the single-device
    XLA render on the 8-device CPU mesh (shard_map + interpret mode)."""
    import dfnet_tpu.render.fast as fast_mod
    from dfnet_tpu.parallel.mesh import make_mesh
    from dfnet_tpu.render.volume import render_image_sharded

    monkeypatch.setattr(fast_mod, "ALLOW_INTERPRET_PATH", True)
    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--netdepth", "2", "--netwidth", "16", "--netdepth_fine", "2",
        "--netwidth_fine", "16", "--N_samples", "8", "--N_importance", "8",
    ], stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    settings = render_settings(cfg, 0.5, 3.5, test=True)
    mesh = make_mesh(8)
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0.0], [1.0]])], -1)
    hist = jnp.zeros((cfg.hist_bin,), jnp.int32)
    out = render_image_sharded(params, model, c2w, hist, 16, 16, 20.0,
                               settings, mesh, chunk=128)
    ref = render_image(params, model, c2w, hist, 16, 16, 20.0, settings,
                       chunk=128)
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
                               atol=3e-2, rtol=3e-2)
