"""Culled fast-render path — CPU tests.

sample_pdf_culled is the TPU-native replacement for occupancy-grid
empty-space culling + transmittance early termination (the reference
fine pass always covers [near, far] — rendering.py:296-302): per ray
the fine budget is restricted to the [q, 1-q] CDF-quantile interval of
the placement weights. These tests pin the sampler's contract (pure
JAX) and drive the culled kernel pipeline in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfnet_tpu.config import parse_args
from dfnet_tpu.models.factory import create_nerfh, render_settings
from dfnet_tpu.render.fast import (
    FastNeRFH,
    render_rays_fast,
    sample_pdf_culled,
)
from dfnet_tpu.render.volume import render_rays


def _peaked_weights(n_rays=8, m=65, center=0.6, width=0.02):
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, m), (n_rays, m))
    mid = 0.5 * (bins[:, 1:] + bins[:, :-1])
    w = jnp.exp(-0.5 * ((mid - center) / width) ** 2)
    return bins, w


def test_culled_samples_concentrate_on_the_peak():
    bins, w = _peaked_weights()
    z = sample_pdf_culled(bins, w, n_total=24, lam=0.1, q=2e-3)
    assert z.shape == (8, 24)
    z = np.asarray(z)
    # sorted, inside the ray range
    assert (np.diff(z, axis=-1) >= -1e-6).all()
    assert (z >= 0.0).all() and (z <= 1.0).all()
    # a ~6-sigma band around the peak holds ALL samples: leading empty
    # space and post-termination space are culled
    assert (z > 0.6 - 8 * 0.02).all(), z.min()
    assert (z < 0.6 + 8 * 0.02).all(), z.max()
    # and the informative interval is sampled densely: mean spacing is
    # much finer than the uniform [0,1] grid at the same budget
    assert np.mean(np.diff(z, axis=-1)) < 0.25 * (1.0 / 24)


def test_culled_uniform_weights_cover_the_full_range():
    bins = jnp.broadcast_to(jnp.linspace(0.5, 2.5, 65), (4, 65))
    w = jnp.ones((4, 64))
    z = np.asarray(sample_pdf_culled(bins, w, n_total=32, lam=0.5, q=2e-3))
    # nothing to cull: samples span ~the whole [near, far]
    assert z.min() < 0.55 and z.max() > 2.45
    assert (np.diff(z, axis=-1) >= -1e-6).all()


def test_culled_truncated_mass_is_bounded():
    """Total placement-weight mass outside [z_min, z_max] stays ~<= 2q
    (plus the one-bin padding) — the error-bound contract in the
    docstring."""
    bins, w = _peaked_weights(n_rays=16, width=0.05)
    q = 2e-3
    z = np.asarray(sample_pdf_culled(bins, w, n_total=24, lam=0.1, q=q))
    mid = np.asarray(0.5 * (bins[:, 1:] + bins[:, :-1]))
    wn = np.asarray(w) / np.asarray(w).sum(-1, keepdims=True)
    lo = z.min(-1, keepdims=True)
    hi = z.max(-1, keepdims=True)
    outside = np.where((mid < lo) | (mid > hi), wn, 0.0).sum(-1)
    # one-bin padding on each side widens the kept interval, so the
    # truncated mass can only be SMALLER than 2q + rounding
    assert (outside <= 2 * q + 1e-4).all(), outside.max()


def test_culled_render_tracks_reference_composite():
    """End-to-end culled pipeline (placement sweep -> quantile interval
    -> 24 concentrated fine samples -> fused composite) in interpret
    mode: on a random-init (smooth, low-density) field the composite
    must track the reference 64+64 XLA schedule closely."""
    import dfnet_tpu.render.fast as fast_mod

    cfg = parse_args(["--NeRFH", "--encode_hist", "--dataset_type",
                      "synthetic", "--precision", "bf16"], stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    settings = render_settings(cfg, 0.0, 2.5, test=True)
    fast = FastNeRFH.pack(params, model)
    align = fast.ray_align(settings, 24, 32)
    N = align * max(1, 64 // align)
    ro = jax.random.normal(jax.random.PRNGKey(7), (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(8), (N, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    hist = jax.random.randint(jax.random.PRNGKey(9), (N, cfg.hist_bin), 0, 10)

    want = render_rays(params, model, ro, rd, hist, settings)
    got = render_rays_fast(fast, ro, rd, hist, settings, exact_union=False,
                           cull_q=2e-3, n_fine=24, n_place=32,
                           fuse_composite=True, interpret=True)
    for k in ("rgb", "disp", "acc", "depth"):
        assert np.isfinite(np.asarray(got[k])).all(), k
    assert got["rgb"].shape == want["rgb"].shape
    acc = np.asarray(got["acc"])
    assert (acc > -1e-3).all() and (acc < 1.0 + 1e-3).all()
    # different sample placement => not bitwise; must still agree at
    # the percent level on a smooth random-init field
    err = np.abs(np.asarray(got["rgb"]) - np.asarray(want["rgb"])).mean()
    assert err < 0.03, err


def test_culled_last_sample_stays_off_the_far_plane():
    """u-endpoint robustness: with peaked weights far from the far
    plane, NO sample may land on it, across many random rays — the
    fixed 1-1e-6 nudge could be undercut by f32 cumsum error in cdf_w,
    so u is scaled by the per-ray flat cdf value instead."""
    rng = np.random.default_rng(0)
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 65), (256, 65))
    centers = rng.uniform(0.2, 0.5, (256, 1))
    mid = np.asarray(0.5 * (np.asarray(bins)[:, 1:] + np.asarray(bins)[:, :-1]))
    w = np.exp(-0.5 * ((mid - centers) / 0.02) ** 2).astype(np.float32)
    w += rng.uniform(0.0, 1e-4, w.shape).astype(np.float32)
    z = np.asarray(sample_pdf_culled(jnp.asarray(bins), jnp.asarray(w),
                                     n_total=24, lam=1.0 / 3.0, q=2e-3))
    assert (z[:, -1] < 0.99).all(), z[:, -1].max()


def test_schedule_flags_rejected_under_exact_union():
    """n_fine/n_place desync ray_align from the structural exact-union
    sample count, so render_rays_fast must reject the combination with
    a clear error; cull_schedule_kwargs gates the config flags."""
    from dfnet_tpu.render.fast import cull_schedule_kwargs

    cfg = parse_args(["--NeRFH", "--encode_hist", "--dataset_type",
                      "synthetic", "--precision", "bf16"], stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    settings = render_settings(cfg, 0.0, 2.5, test=True)
    fast = FastNeRFH.pack(params, model)
    n = fast.ray_align(settings)
    ro = jnp.zeros((n, 3))
    rd = jnp.ones((n, 3))
    hist = jnp.zeros((n, cfg.hist_bin), jnp.int32)
    with pytest.raises(ValueError, match="exact-union"):
        render_rays_fast(fast, ro, rd, hist, settings, exact_union=True,
                         n_fine=24, interpret=True)
    with pytest.raises(ValueError, match="exact-union"):
        render_rays_fast(fast, ro, rd, hist, settings, exact_union=True,
                         n_place=32, interpret=True)
    # the config gate only forwards the knobs when culling is on
    kw = cull_schedule_kwargs(cfg.replace(render_fine_total=24,
                                          render_place_samples=32))
    assert kw == {"cull_q": 0.0, "n_fine": None, "n_place": None}
    kw = cull_schedule_kwargs(cfg.replace(render_cull_q=2e-3,
                                          render_fine_total=24,
                                          render_place_samples=32))
    assert kw == {"cull_q": 2e-3, "n_fine": 24, "n_place": 32}


# ---------------------------------------------------------------------------
# train-time culling (train_cull_q / train_fine_total)
# ---------------------------------------------------------------------------

def _train_setup(extra=()):
    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--netdepth", "4", "--netwidth", "32", "--netdepth_fine", "4",
        "--netwidth_fine", "32", "--N_samples", "16", "--N_importance",
        "16", "--precision", "bf16", *extra,
    ], stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    settings = render_settings(cfg, 0.5, 3.5)
    return cfg, model, params, settings


def test_train_cull_shapes_and_grads():
    """Culled train schedule: z_all carries train_fine_total samples,
    outputs stay finite, and every MLP/embedding leaf still gets a
    nonzero gradient (the culled draw is stop-gradient, like the
    reference's detached z_samples)."""
    from dfnet_tpu.models.losses import nerfw_loss

    cfg, model, params, settings = _train_setup(
        ["--train_cull_q", "2e-3", "--train_fine_total", "12"])
    assert settings.train_cull_q == 2e-3
    n = 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    ro = jax.random.normal(k1, (n, 3)) * 0.1
    rd = jax.random.normal(k2, (n, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    hist = jnp.zeros((n, cfg.hist_bin), jnp.int32)
    target = jax.random.uniform(k3, (n, 3))

    out = render_rays(params, model, ro, rd, hist, settings,
                      jax.random.PRNGKey(7))
    assert out["z_all"].shape == (n, 12)
    for k in ("rgb0", "rgb", "beta", "acc"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    # z_all stays inside [near, far] and sorted (stratified draw)
    z = np.asarray(out["z_all"])
    assert (z >= settings.near).all() and (z <= settings.far).all()
    assert (np.diff(z, axis=-1) >= -1e-5).all()

    def loss(p):
        o = render_rays(p, model, ro, rd, hist, settings,
                        jax.random.PRNGKey(7))
        return sum(nerfw_loss(o, target).values())

    g = jax.grad(loss)(params)
    for key, v in jax.tree_util.tree_leaves_with_path(g):
        ks = jax.tree_util.keystr(key)
        if ks.startswith("['proposal']"):
            continue
        assert np.abs(np.asarray(v)).max() > 0, f"zero grad at {ks}"


def test_train_cull_fused_matches_xla():
    """Fused custom-VJP train path under the culled schedule: forward
    and gradients match the XLA path (identical rng split order, so the
    culled stratified draw is identical too)."""
    from dfnet_tpu.models.losses import nerfw_loss
    from dfnet_tpu.render.fused_train import (fused_train_supported,
                                              render_rays_train_fused,
                                              train_ray_align)

    cfg, model, params, settings = _train_setup(
        ["--train_cull_q", "2e-3", "--train_fine_total", "16"])
    n = train_ray_align(settings)
    assert fused_train_supported(model, settings, n) or \
        jax.default_backend() == "cpu"
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    ro = jax.random.normal(k1, (n, 3)) * 0.1
    rd = jax.random.normal(k2, (n, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    hist = jnp.zeros((n, cfg.hist_bin), jnp.int32)
    target = jax.random.uniform(k3, (n, 3))
    rng = jax.random.PRNGKey(9)

    ref = render_rays(params, model, ro, rd, hist, settings, rng)
    fused = render_rays_train_fused(params, model, ro, rd, hist, settings,
                                    rng)
    np.testing.assert_allclose(np.asarray(ref["z_all"]),
                               np.asarray(fused["z_all"]), atol=2e-3)
    for k in ("rgb0", "rgb", "beta", "acc"):
        a, b = np.asarray(ref[k]), np.asarray(fused[k])
        assert np.allclose(a, b, atol=5e-3), (
            f"{k}: max err {np.abs(a - b).max()}")

    def loss_ref(p):
        return sum(nerfw_loss(
            render_rays(p, model, ro, rd, hist, settings, rng),
            target).values())

    def loss_fused(p):
        return sum(nerfw_loss(
            render_rays_train_fused(p, model, ro, rd, hist, settings, rng),
            target).values())

    lr, gr = jax.value_and_grad(loss_ref)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    assert np.allclose(float(lr), float(lf), rtol=1e-3)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gf)}
    for key, vr in jax.tree_util.tree_leaves_with_path(gr):
        ks = jax.tree_util.keystr(key)
        if ks.startswith("['proposal']"):
            continue
        vf = flat_f[ks]
        vr, vf = np.asarray(vr, np.float64), np.asarray(vf, np.float64)
        scale = max(np.abs(vr).max(), np.abs(vf).max(), 1e-6)
        assert np.abs(vr - vf).max() < 3e-2 * scale + 3e-7, ks


def test_train_cull_loss_decreases():
    """A few Adam steps under the culled train schedule reduce the loss
    on a fixed batch (sanity that the restricted schedule trains)."""
    import optax

    from dfnet_tpu.models.losses import nerfw_loss

    cfg, model, params, settings = _train_setup(
        ["--train_cull_q", "2e-3", "--train_fine_total", "12"])
    n = 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    ro = jax.random.normal(k1, (n, 3)) * 0.1
    rd = jax.random.normal(k2, (n, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    hist = jnp.zeros((n, cfg.hist_bin), jnp.int32)
    target = jax.random.uniform(k3, (n, 3))
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, rng):
        def loss_fn(p):
            o = render_rays(p, model, ro, rd, hist, settings, rng)
            return sum(nerfw_loss(o, target).values())
        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    losses = []
    for i in range(8):
        params, opt_state, l = step(params, opt_state,
                                    jax.random.PRNGKey(100 + i))
        losses.append(float(l))
    assert losses[-1] < losses[0], losses


def test_train_cull_warmup_switch(monkeypatch, tmp_path):
    """With train_cull_q>0 and train_cull_warmup=W, the trainer builds a
    warm epoch fn whose settings have culling OFF and uses it for epochs
    < W, switching to the culled primary fn at epoch W (ADVICE.md r3)."""
    from dfnet_tpu.data.synthetic import make_synthetic_scene
    from dfnet_tpu.training.nerf_trainer import NeRFTrainer

    built = []
    orig_make = NeRFTrainer._make_epoch

    def spy(self, settings, primary):
        built.append((settings, primary))
        return orig_make(self, settings, primary)

    monkeypatch.setattr(NeRFTrainer, "_make_epoch", spy)
    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--netdepth", "2", "--netwidth", "16", "--netdepth_fine", "2",
        "--netwidth_fine", "16", "--N_samples", "8", "--N_importance", "8",
        "--N_rand", "16", "--train_cull_q", "2e-3", "--train_fine_total",
        "8", "--train_cull_warmup", "2", "--basedir", str(tmp_path),
    ], stage="nerf")
    scene = make_synthetic_scene(n_train=2, n_val=1, H=8, W=8, focal=8.0,
                                 seed=0)
    tr = NeRFTrainer(cfg, scene)

    # primary fn built with culling ON, warm fn with culling OFF
    assert [p for _, p in built] == [True, False]
    assert built[0][0].train_cull_q == 2e-3
    assert built[0][0].train_fine_total == 8
    assert built[1][0].train_cull_q == 0.0
    assert built[1][0].train_fine_total == 0

    calls = []

    def fake(tag):
        def fn(params, opt_state, images, poses, hists, order, rng, lr,
               epoch):
            calls.append(tag)
            return params, opt_state, jnp.float32(0.0), jnp.float32(0.0), rng
        return fn

    tr._epoch = fake("primary")
    tr._epoch_warm = fake("warm")
    for e in range(4):
        tr.train_epoch(e)
    assert calls == ["warm", "warm", "primary", "primary"]
