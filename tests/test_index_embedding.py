"""NeRF-W per-image-index embedding mode (NeRFH with encode_hist=False).

Reference semantics (/root/reference/script/models/nerfw.py:69-95 +
dataset_loaders/seven_scenes.py:340-344): embedding_a/t are
(N_vocab, in_channels_a/t) tables indexed by the frame's split position
(train) or 0 (test / --fix_index); the (N,1,C) lookup flattens to (N,C)
through the same reshape the histogram mode uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from dfnet_tpu.config import parse_args
from dfnet_tpu.models.factory import create_nerfh, render_settings
from dfnet_tpu.models.nerfw import lookup_hist_embedding

INDEX_ARGS = [
    "--NeRFH", "--dataset_type", "synthetic",
    "--netdepth", "2", "--netwidth", "16", "--netdepth_fine", "2",
    "--netwidth_fine", "16", "--N_samples", "6", "--N_importance", "6",
    "--N_rand", "64",
]


def test_index_lookup_matches_torch_embedding():
    """table[idx] flatten == torch nn.Embedding(ts.long()) + the
    len(size)==3 reshape (nerfw.py:69-81), for full-width index rows."""
    emb = nn.Embedding(100, 50)
    ids = torch.tensor([[0], [3], [99], [3]])
    with torch.no_grad():
        a = emb(ids)                       # (N,1,50)
    ref = a.reshape(ids.shape[0], -1).numpy()
    ours = lookup_hist_embedding(
        jnp.asarray(emb.weight.detach().numpy()), jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_factory_index_mode_table_shapes():
    cfg = parse_args(INDEX_ARGS, stage="nerf")
    assert not cfg.encode_hist
    _, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    assert params["embedding_a"].shape == (cfg.N_vocab, cfg.in_channels_a)
    assert params["embedding_t"].shape == (cfg.N_vocab, cfg.in_channels_t)

    cfg_h = parse_args(INDEX_ARGS + ["--encode_hist"], stage="nerf")
    _, params_h = create_nerfh(cfg_h, jax.random.PRNGKey(0))
    assert params_h["embedding_a"].shape == (
        cfg_h.N_vocab, cfg_h.in_channels_a // cfg_h.hist_bin)


def test_loader_emits_indices():
    from dfnet_tpu.data.loader import load_scene

    cfg = parse_args(INDEX_ARGS, stage="nerf")
    scene = load_scene(cfg, stage="nerf")
    n = len(scene.train)
    assert scene.train.hists.shape == (n, 1)
    np.testing.assert_array_equal(scene.train.hists[:, 0], np.arange(n))
    np.testing.assert_array_equal(scene.val.hists, 0)

    fixed = load_scene(cfg.replace(fix_index=True), stage="nerf")
    np.testing.assert_array_equal(fixed.train.hists, 0)


def test_stage1_index_mode_trains_and_renders(tmp_path):
    """End-to-end stage-1 smoke without --encode_hist: the index-mode
    render_rays path shape-checks, trains, and eval-renders."""
    import run_nerf

    argv = INDEX_ARGS + ["--basedir", str(tmp_path), "--expname", "nerfh_idx",
                         "--epochs", "2", "--i_weights", "2",
                         "--i_testset", "1000"]
    run_nerf.train(argv)
    assert (tmp_path / "nerfh_idx" / "000002.npz").exists()
    psnr = run_nerf.train(argv + ["--render_test"])
    assert psnr is not None and np.isfinite(psnr)


def test_index_mode_render_rays_uses_per_frame_rows():
    """Different frame ids select different appearance rows → different
    fine rgb for identical rays."""
    from dfnet_tpu.render.volume import render_rays

    cfg = parse_args(INDEX_ARGS, stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    settings = render_settings(cfg, 0.5, 3.5, test=True)
    n = 8
    rays_o = jnp.zeros((n, 3))
    rays_d = jnp.concatenate([jnp.zeros((n, 2)), -jnp.ones((n, 1))], -1)
    out0 = render_rays(params, model, rays_o, rays_d,
                       jnp.zeros((n, 1), jnp.int32), settings)
    out7 = render_rays(params, model, rays_o, rays_d,
                       jnp.full((n, 1), 7, jnp.int32), settings)
    assert out0["rgb"].shape == (n, 3)
    assert not np.allclose(np.asarray(out0["rgb"]), np.asarray(out7["rgb"]))


def test_fast_path_index_mode_parity():
    """The fused render path handles index-mode (encode_hist=False)
    conditioning: hist is a (N,1) frame-index column and the embedding
    lookup returns full-width rows (reference nerfw.py:69-95)."""
    import numpy as np

    from dfnet_tpu.models.factory import create_nerfh, render_settings
    from dfnet_tpu.render.fast import FastNeRFH, render_rays_fast
    from dfnet_tpu.render.volume import render_rays

    cfg = parse_args([
        "--NeRFH", "--dataset_type", "synthetic", "--precision", "bf16",
    ], stage="nerf")
    assert not cfg.encode_hist
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    settings = render_settings(cfg, 0.0, 2.5, test=True)
    fast = FastNeRFH.pack(params, model)
    N = fast.ray_align(settings)
    ro = jax.random.normal(jax.random.PRNGKey(1), (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    idx = jax.random.randint(jax.random.PRNGKey(3), (N, 1), 0, 5)
    want = render_rays(params, model, ro, rd, idx, settings)
    got = render_rays_fast(fast, ro, rd, idx, settings, exact_union=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(want["rgb"]),
                               atol=3e-2, rtol=3e-2)
