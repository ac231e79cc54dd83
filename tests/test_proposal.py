"""Proposal sampler (TPU-native speed knob): interlevel bound loss,
joint training, and fast-path placement.

The proposal is a tiny sigma-only MLP trained alongside stage 1 to
upper-bound the fine weights per coarse interval (mip-NeRF 360
interlevel loss, arXiv 2111.12077); at test time it replaces the
D=8/W=128 coarse sweep for sample placement. Reference pipeline being
accelerated: /root/reference/script/models/rendering.py:245-337.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfnet_tpu.config import parse_args
from dfnet_tpu.data.synthetic import make_synthetic_scene
from dfnet_tpu.models.factory import create_nerfh, render_settings
from dfnet_tpu.models.losses import proposal_bound_loss
from dfnet_tpu.render.fast import FastNeRFH, render_rays_fast
from dfnet_tpu.render.volume import render_rays
from dfnet_tpu.training.nerf_trainer import NeRFTrainer


def test_bound_loss_zero_when_proposal_dominates():
    N, S, Sf = 3, 8, 16
    z_vals = jnp.broadcast_to(jnp.linspace(0.0, 2.0, S), (N, S))
    z_all = jnp.broadcast_to(jnp.linspace(0.0, 2.0, Sf), (N, Sf))
    w_fine = jnp.full((N, Sf), 0.01)
    w_prop = jnp.full((N, S), 1.0)       # dominates everywhere
    assert float(proposal_bound_loss(w_prop, z_vals, w_fine, z_all)) == 0.0
    # proposal misses the mass -> positive loss
    w_prop0 = jnp.zeros((N, S))
    assert float(proposal_bound_loss(w_prop0, z_vals, w_fine, z_all)) > 0.0


def test_create_nerfh_proposal_gating():
    base = ["--NeRFH", "--encode_hist", "--dataset_type", "synthetic"]
    cfg = parse_args(base, stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    assert "proposal" in params and model.cfg_proposal is not None
    assert model.cfg_proposal.D == cfg.proposal_D
    cfg_off = parse_args(base + ["--proposal", "false"], stage="nerf")
    model2, params2 = create_nerfh(cfg_off, jax.random.PRNGKey(0))
    assert "proposal" not in params2 and model2.cfg_proposal is None


def test_proposal_trains_and_bound_improves():
    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--netdepth", "2", "--netwidth", "16", "--netdepth_fine", "2",
        "--netwidth_fine", "16", "--N_samples", "8", "--N_importance", "8",
        "--N_rand", "64", "--proposal_D", "1", "--proposal_W", "16",
    ], stage="nerf")
    scene = make_synthetic_scene(n_train=2, n_val=1, H=8, W=8, seed=0)
    tr = NeRFTrainer(cfg, scene)
    p0 = jax.tree.map(np.asarray, tr.params["proposal"])
    for e in range(4):
        loss, psnr = tr.train_epoch(e)
    assert np.isfinite(loss)
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        tr.params["proposal"], p0)
    assert max(jax.tree.leaves(moved)) > 0.0, "proposal got no gradient"


def test_fast_render_proposal_placement_matches_when_copied():
    """With the proposal an exact copy of the coarse trunk+sigma, the
    proposal-placed fast render equals the coarse-placed XLA render."""
    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--precision", "bf16", "--proposal_D", "8", "--proposal_W", "128",
        "--proposal_multires", "10",
    ], stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    # copy coarse trunk + sigma head into the proposal (same D/W)
    prop = {k: v for k, v in params["coarse"].items()
            if k.startswith("xyz_") and k != "xyz_final"}
    prop["static_sigma"] = params["coarse"]["static_sigma"]
    params["proposal"] = prop
    model = dataclasses.replace(
        model, cfg_proposal=dataclasses.replace(model.cfg_coarse),
        embed_proposal=model.embed_xyz)
    settings = render_settings(cfg, 0.0, 2.5, test=True)
    fast = FastNeRFH.pack(params, model, use_proposal=True)
    assert fast.packed_proposal is not None
    N = fast.ray_align(settings) * 2
    key = jax.random.PRNGKey(7)
    ro = jax.random.normal(key, (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(8), (N, 3))
    rd = rd / jnp.linalg.norm(rd, -1, keepdims=True)
    hist = jax.random.randint(jax.random.PRNGKey(9), (N, cfg.hist_bin), 0, 10)
    want = render_rays(params, model, ro, rd, hist, settings)
    got = render_rays_fast(fast, ro, rd, hist, settings, exact_union=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(want["rgb"]),
                               atol=3e-2, rtol=3e-2)


def test_resume_merges_missing_proposal(tmp_path):
    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--netdepth", "2", "--netwidth", "16", "--netdepth_fine", "2",
        "--netwidth_fine", "16", "--N_samples", "8", "--N_importance", "8",
        "--N_rand", "32", "--basedir", str(tmp_path), "--expname", "exp",
    ], stage="nerf")
    scene = make_synthetic_scene(n_train=2, n_val=1, H=8, W=8, seed=0)
    tr = NeRFTrainer(cfg, scene)
    # simulate an old checkpoint without the proposal subtree
    from dfnet_tpu.training.checkpoints import save_pytree
    import os
    old_params = {k: v for k, v in tr.params.items() if k != "proposal"}
    os.makedirs(tr.expdir(), exist_ok=True)
    save_pytree(f"{tr.expdir()}/000005.npz", {"params": old_params},
                global_step=5)
    tr2 = NeRFTrainer(cfg, scene)
    step = tr2.try_resume()
    assert step == 5 and "proposal" in tr2.params
    tr2.train_epoch(0)  # step still runs
