"""Model factory: build the NeRF-H (coarse+fine+embeddings) bundle from a
Config — the create_nerf equivalent (reference:
/root/reference/script/models/nerfw.py:356-501), minus the torch
checkpoint-dir scanning (checkpointing lives in training/checkpoints.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dfnet_tpu.config import Config
from dfnet_tpu.models.embedder import get_embedder
from dfnet_tpu.models.nerfw import (
    NeRFWConfig,
    init_embeddings,
    init_nerfw_params,
    init_sigma_mlp,
)
from dfnet_tpu.render.volume import NeRFHModel, RenderSettings


def create_nerfh(cfg: Config, key: jax.Array) -> Tuple[NeRFHModel, Dict]:
    """Returns (static model description, trainable param pytree).

    In non-NeRFH mode builds the vanilla-NeRF pair instead (reference
    create_nerf dispatch, nerfw.py:393-397)."""
    embed_xyz = get_embedder(cfg.multires, cfg.i_embed, cfg.reduce_embedding,
                             cfg.epochToMaxFreq, input_dims=3)
    embed_dir = get_embedder(cfg.multires_views, cfg.i_embed, cfg.reduce_embedding,
                             cfg.epochToMaxFreq, input_dims=3)

    if not cfg.NeRFH:
        return _create_vanilla(cfg, key, embed_xyz, embed_dir)

    dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    cfg_coarse = NeRFWConfig(
        D=cfg.netdepth, W=cfg.netwidth, in_xyz=embed_xyz.out_dim,
        in_dir=embed_dir.out_dim, out_ch=cfg.out_channel_size,
        compute_dtype=dtype)
    cfg_fine = NeRFWConfig(
        D=cfg.netdepth_fine, W=cfg.netwidth_fine, in_xyz=embed_xyz.out_dim,
        in_dir=embed_dir.out_dim, in_a=cfg.in_channels_a, in_t=cfg.in_channels_t,
        encode_appearance=True, encode_transient=True, beta_min=cfg.beta_min,
        out_ch=cfg.out_channel_size, compute_dtype=dtype)

    kc, kf, ke, kp = jax.random.split(key, 4)
    params = {"coarse": init_nerfw_params(kc, cfg_coarse)}
    cfg_proposal = None
    embed_proposal = None
    if cfg.proposal and cfg.N_importance > 0:
        # tiny sigma-only sampler, trained alongside stage 1 with an
        # interlevel bound loss; replaces the D=8/W=128 coarse sweep for
        # test-render sample placement (TPU speed knob, see render/fast).
        # Its own small PE (proposal_multires) keeps the fused kernel's
        # feature/sine work proportional to the tiny MLP.
        embed_proposal = get_embedder(cfg.proposal_multires, cfg.i_embed,
                                      input_dims=3)
        cfg_proposal = NeRFWConfig(
            D=cfg.proposal_D, W=cfg.proposal_W, skips=(),
            in_xyz=embed_proposal.out_dim, in_dir=embed_dir.out_dim,
            compute_dtype=dtype)
        params["proposal"] = init_sigma_mlp(kp, cfg_proposal)
    if cfg.N_importance > 0:
        params["fine"] = init_nerfw_params(kf, cfg_fine)
        # hist mode: hist_bin rows of (in_a/hist_bin) dims are gathered
        # and flattened; index mode (encode_hist=False): one full-width
        # row per frame id (reference nerfw.py:385-391 vs :69-81)
        if cfg.encode_hist:
            n_a, n_tau = (cfg.in_channels_a // cfg.hist_bin,
                          cfg.in_channels_t // cfg.hist_bin)
        else:
            n_a, n_tau = cfg.in_channels_a, cfg.in_channels_t
        emb = init_embeddings(ke, cfg.N_vocab, n_a=n_a, n_tau=n_tau)
        params["embedding_a"] = emb["a"]
        params["embedding_t"] = emb["t"]

    model = NeRFHModel(cfg_coarse=cfg_coarse, cfg_fine=cfg_fine,
                       embed_xyz=embed_xyz, embed_dir=embed_dir,
                       cfg_proposal=cfg_proposal,
                       embed_proposal=embed_proposal)
    return model, params


def _create_vanilla(cfg: Config, key, embed_xyz, embed_dir):
    from dfnet_tpu.models.nerf_vanilla import VanillaNeRFConfig, init_nerf_params
    from dfnet_tpu.render.volume import VanillaNeRFModel

    dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    cfg_c = VanillaNeRFConfig(
        D=cfg.netdepth, W=cfg.netwidth, in_xyz=embed_xyz.out_dim,
        in_dir=embed_dir.out_dim, use_viewdirs=cfg.use_viewdirs,
        output_ch=5 if cfg.N_importance > 0 else 4, compute_dtype=dtype)
    cfg_f = VanillaNeRFConfig(
        D=cfg.netdepth_fine, W=cfg.netwidth_fine, in_xyz=embed_xyz.out_dim,
        in_dir=embed_dir.out_dim, use_viewdirs=cfg.use_viewdirs,
        output_ch=5 if cfg.N_importance > 0 else 4, compute_dtype=dtype)
    kc, kf = jax.random.split(key)
    params = {"coarse": init_nerf_params(kc, cfg_c)}
    if cfg.N_importance > 0:
        params["fine"] = init_nerf_params(kf, cfg_f)
    model = VanillaNeRFModel(cfg_coarse=cfg_c, cfg_fine=cfg_f,
                             embed_xyz=embed_xyz, embed_dir=embed_dir)
    return model, params


def render_settings(cfg: Config, near: float, far: float,
                    test: bool = False) -> RenderSettings:
    s = RenderSettings(
        N_samples=cfg.N_samples, N_importance=cfg.N_importance,
        perturb=cfg.perturb, raw_noise_std=cfg.raw_noise_std,
        lindisp=cfg.lindisp, white_bkgd=cfg.white_bkgd,
        near=float(near), far=float(far),
        fine_importance_only=cfg.fine_importance_only,
        train_cull_q=cfg.train_cull_q,
        train_fine_total=cfg.train_fine_total)
    return s.test() if test else s
