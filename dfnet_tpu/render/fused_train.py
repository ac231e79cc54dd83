"""Stage-1 training through the fused Pallas MLP kernels (custom VJP).

The XLA train step spends most of its time materializing positional-
encoding tensors and running the coarse/fine MLP matmuls at XLA's
standalone-op rate (~0.8 ms per (·,128)@(128,128) bf16 layer per 2M pts
vs 0.36 in-kernel). This module swaps BOTH train-mode MLP sweeps for
the fused transposed kernels (ops/nerf_kernels.fine_raw_t) wrapped in a
jax.custom_vjp whose backward is a recompute-in-VMEM Pallas kernel
(raw_bwd_t); sampling, compositing, loss and Adam stay XLA, operating
on the kernels' channel-major (16, N, S) raw output (SoA — no
point-major relayouts).

Functional parity with render_rays(train settings): reference
/root/reference/script/run_nerf.py:32-80 (train_on_epoch),
models/rendering.py:245-337 (pipeline semantics), models/nerfw.py:
220-354 (MLP). Gradient contract: cotangents are returned for the MLP
parameters and the per-ray conditioning row (-> appearance/transient
embeddings + dir/transient per-ray weight halves) ONLY; rays and
z-samples get zero cotangents, which is exact for stage 1 because fine
z's are drawn under stop_gradient (reference rendering.py:302 detaches
z_samples) and rays are data. Stage 3 (grad -> pose through rays) must
keep the XLA path.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from dfnet_tpu.models.nerfw import lookup_hist_embedding
from dfnet_tpu.ops import nerf_kernels as nk
from dfnet_tpu.render.fast import _shifted_cumprod_lanes as _shifted_cumprod
from dfnet_tpu.render.sampling import sample_pdf, stratified_z_vals
from dfnet_tpu.render.volume import NeRFHModel, RenderSettings


# ---------------------------------------------------------------------------
# custom-VJP raw sweep
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def raw_sweep_ad(packed, rays_o, rays_d, z_all, dpt, spec, interpret=False):
    """Differentiable fused raw sweep: (16, N, S) pre-activation rows.
    Gradients flow to `packed` (and through the pack to the params) and
    to `dpt`; rays/z receive zeros (see module docstring)."""
    return nk.fine_raw_t(packed, rays_o, rays_d, z_all, dpt, spec,
                         interpret=interpret)


def _raw_fwd(packed, rays_o, rays_d, z_all, dpt, spec, interpret):
    out = nk.fine_raw_t(packed, rays_o, rays_d, z_all, dpt, spec,
                        interpret=interpret)
    return out, (packed, rays_o, rays_d, z_all, dpt)


def _raw_bwd(spec, interpret, res, g):
    packed, rays_o, rays_d, z_all, dpt = res
    d_packed, d_dpt = nk.raw_bwd_t(packed, rays_o, rays_d, z_all, dpt,
                                   g.astype(jnp.float32), spec,
                                   interpret=interpret)
    return (d_packed, jnp.zeros_like(rays_o), jnp.zeros_like(rays_d),
            jnp.zeros_like(z_all), d_dpt.astype(dpt.dtype))


raw_sweep_ad.defvjp(_raw_fwd, _raw_bwd)


# ---------------------------------------------------------------------------
# SoA train-time composites (channel-major raw input)
# ---------------------------------------------------------------------------


def composite_static_train(raw16, z_vals, white_bkgd: bool = False,
                           raw_noise: Optional[jnp.ndarray] = None) -> Dict:
    """Coarse train composite from static raw rows [rgb 0:3, sigma 3]
    (pre-activation). Matches volume.composite_nerfw(output_transient=
    False): softplus sigma (+ optional relu'd noise), sigmoid rgb, 1e2
    terminal delta."""
    rgb = jax.nn.sigmoid(raw16[0:3])                   # (3, N, S)
    sig = jax.nn.softplus(raw16[3])                    # (N, S)
    if raw_noise is not None:
        sig = jax.nn.relu(sig + raw_noise)
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = jnp.concatenate([deltas, 1e2 * jnp.ones_like(deltas[:, :1])], -1)
    alphas = 1.0 - jnp.exp(-deltas * sig)
    trans = _shifted_cumprod(alphas)
    weights = alphas * trans
    acc = weights.sum(-1)
    rgb_map = jnp.stack([(weights * rgb[c]).sum(-1) for c in range(3)], -1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[:, None])
    depth = (weights * z_vals).sum(-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
    return {"rgb": rgb_map, "disp": disp, "acc": acc, "depth": depth,
            "weights": weights}


def composite_nerfw_train(raw16, z_all, beta_min: float,
                          white_bkgd: bool = False) -> Dict:
    """Fine train composite from transient raw rows (pre-activation,
    rows [rgb 0:3, sigma 3, trgb 4:7, tsigma 7, tbeta 8]). Matches
    volume.composite_nerfw(output_transient=True, test_time=False):
    combined rgb, beta_min added AFTER beta composition, depth from the
    combined weights."""
    srgb = jax.nn.sigmoid(raw16[0:3])
    ssig = jax.nn.softplus(raw16[3])
    trgb = jax.nn.sigmoid(raw16[4:7])
    tsig = jax.nn.softplus(raw16[7])
    tbeta = jax.nn.softplus(raw16[8])

    deltas = z_all[:, 1:] - z_all[:, :-1]
    deltas = jnp.concatenate([deltas, 1e2 * jnp.ones_like(deltas[:, :1])], -1)
    static_alphas = 1.0 - jnp.exp(-deltas * ssig)
    transient_alphas = 1.0 - jnp.exp(-deltas * tsig)
    alphas = 1.0 - jnp.exp(-deltas * (ssig + tsig))
    trans = _shifted_cumprod(alphas)
    weights = alphas * trans
    acc = weights.sum(-1)

    static_w = static_alphas * trans
    transient_w = transient_alphas * trans
    static_rgb = jnp.stack([(static_w * srgb[c]).sum(-1) for c in range(3)], -1)
    if white_bkgd:
        static_rgb = static_rgb + (1.0 - acc[:, None])
    transient_rgb = jnp.stack([(transient_w * trgb[c]).sum(-1)
                               for c in range(3)], -1)
    beta = (transient_w * tbeta).sum(-1) + beta_min
    depth = (weights * z_all).sum(-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
    return {"rgb": static_rgb + transient_rgb, "beta": beta,
            "transient_sigmas": tsig, "weights": weights, "acc": acc,
            "depth": depth, "disp": disp}


# ---------------------------------------------------------------------------
# fused train render
# ---------------------------------------------------------------------------

def train_ray_align(settings: RenderSettings, W: int = nk.LANES,
                    W_fine: Optional[int] = None) -> int:
    """Ray-batch alignment the fused train path needs (fwd + bwd tiles
    of both sweeps). Each sweep tiles by ITS OWN net's width (wide MLPs
    halve the point tiles — see nk.fine_tile_target / raw_bwd_t's
    packed["w0"] width): W is the coarse trunk, W_fine the fine trunk
    (defaults to W). The LCM over all four (S, width) tile geometries
    is what N_rand must divide by."""
    if W_fine is None:
        W_fine = W
    S = settings.N_samples
    S_all = S + settings.N_importance
    if settings.fine_importance_only:
        S_all = settings.N_importance
    if settings.train_cull_q > 0.0 and settings.train_fine_total:
        S_all = settings.train_fine_total

    def bwd_t(w):
        return 1024 if w <= nk.LANES else 512

    a = 1
    for r in (nk.ray_tile(S, W), nk.ray_tile(S_all, W_fine),
              nk.tile_geometry(S, target=bwd_t(W))[0],
              nk.tile_geometry(S_all, target=bwd_t(W_fine))[0]):
        a = a * r // math.gcd(a, r)
    return a


# On the CPU backend the kernels would run in (slow) interpret mode —
# production call sites keep the XLA step there; parity tests flip this.
ALLOW_INTERPRET_TRAIN = False


def fused_train_supported(model, settings: RenderSettings,
                          n_rand: int) -> bool:
    """Whether the fused train path can serve this configuration (same
    envelope as the fast render path + ray-batch divisibility)."""
    if jax.default_backend() == "cpu" and not ALLOW_INTERPRET_TRAIN:
        return False
    if not isinstance(model, NeRFHModel):
        return False
    if model.cfg_fine.out_ch != 3 or settings.N_importance <= 0:
        return False
    if not model.cfg_fine.encode_transient:
        return False
    if jax.default_backend() != "cpu":
        if min(model.cfg_coarse.W, model.cfg_fine.W) < 64:
            return False
    # wide MLPs supported for lane-aligned widths up to 2*LANES
    # (taller conditioning tiles + halved point tiles, see fast.py)
    for w in (model.cfg_coarse.W, model.cfg_fine.W):
        if w > nk.LANES and (w % nk.LANES != 0 or w > 2 * nk.LANES):
            return False
    if model.embed_xyz.windowed or model.embed_dir.windowed:
        return False
    if 6 * model.embed_xyz.num_freqs + 3 > nk.LANES:
        return False
    try:
        if n_rand % train_ray_align(settings, model.cfg_coarse.W,
                                    model.cfg_fine.W) != 0:
            return False
    except ValueError:
        return False
    return True


def render_rays_train_fused(
    params: Dict,
    model: NeRFHModel,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    hist: jnp.ndarray,
    settings: RenderSettings,
    rng: jax.Array,
    interpret: Optional[bool] = None,
) -> Dict:
    """Drop-in for volume.render_rays at TRAIN time (NeRF-H transient
    models): same sampling, composites and output keys, with both MLP
    sweeps running as fused kernels under raw_sweep_ad. Gradients flow
    to all MLP/embedding parameters; rays get none (stage-1 contract)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = rays_o.shape[0]
    S = settings.N_samples
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = jnp.full((n, 1), settings.near, rays_o.dtype)
    far = jnp.full((n, 1), settings.far, rays_o.dtype)
    k_strat, k_pdf, k_noise = jax.random.split(rng, 3)

    z_vals = stratified_z_vals(near, far, S, k_strat, settings.lindisp,
                               settings.perturb)
    z_vals = jax.lax.stop_gradient(z_vals)

    cfgc, cfgf = model.cfg_coarse, model.cfg_fine
    dir_emb = model.embed_dir(viewdirs)

    def eff_skip(c):
        return c.skips[0] if c.skips and c.skips[0] < c.D else -1

    # ---- coarse sweep (full static pass at train time)
    packed_c = nk.pack_static_t(params["coarse"], cfgc, model.embed_xyz)
    spec_c = nk.KernelSpec(D=cfgc.D, skip=eff_skip(cfgc),
                           F=model.embed_xyz.num_freqs, fine=False)
    dpt_c = nk.per_ray_row_static(params["coarse"], cfgc, dir_emb)
    raw_c = raw_sweep_ad(packed_c, rays_o, rays_d, z_vals, dpt_c, spec_c,
                         interpret)
    noise = None
    if settings.raw_noise_std > 0.0:
        noise = settings.raw_noise_std * jax.random.normal(
            k_noise, (n, S))
    comp_c = composite_static_train(raw_c, z_vals,
                                    white_bkgd=settings.white_bkgd,
                                    raw_noise=noise)
    out: Dict = {"rgb0": comp_c["rgb"], "disp0": comp_c["disp"],
                 "acc0": comp_c["acc"]}

    # ---- fine sampling (reference: detached inverse-CDF union;
    # culled train profile: per-ray interval restriction, fast.py)
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    if settings.train_cull_q > 0.0:
        from dfnet_tpu.render.fast import sample_pdf_culled

        lam = S / (S + settings.N_importance)
        nf = settings.train_fine_total or (S + settings.N_importance)
        z_all = sample_pdf_culled(
            z_mid, comp_c["weights"][..., 1:-1], nf, lam=lam,
            q=settings.train_cull_q,
            rng=(k_pdf if settings.perturb > 0.0 else None))
        z_samples = z_all
    else:
        z_samples = sample_pdf(z_mid, comp_c["weights"][..., 1:-1],
                               settings.N_importance, k_pdf,
                               det=(settings.perturb == 0.0))
        if settings.fine_importance_only:
            z_all = jnp.sort(z_samples, -1)
        else:
            z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
    z_all = jax.lax.stop_gradient(z_all)

    # ---- fine sweep (transient)
    packed_f = nk.pack_fine_t(params["fine"], cfgf, model.embed_xyz)
    spec_f = nk.KernelSpec(D=cfgf.D, skip=eff_skip(cfgf),
                           F=model.embed_xyz.num_freqs, fine=True)
    a_emb = lookup_hist_embedding(params["embedding_a"], hist)
    t_emb = lookup_hist_embedding(params["embedding_t"], hist)
    dpt_f = nk.per_ray_row(params["fine"], cfgf, dir_emb, a_emb, t_emb)
    raw_f = raw_sweep_ad(packed_f, rays_o, rays_d, z_all, dpt_f, spec_f,
                         interpret)
    comp_f = composite_nerfw_train(raw_f, z_all, beta_min=cfgf.beta_min,
                                   white_bkgd=settings.white_bkgd)
    out.update(rgb=comp_f["rgb"], disp=comp_f["disp"], acc=comp_f["acc"],
               depth=comp_f["depth"], beta=comp_f["beta"],
               transient_sigmas=comp_f["transient_sigmas"],
               z_std=jnp.std(z_samples, axis=-1),
               z_vals=z_vals, z_all=z_all, weights_fine=comp_f["weights"])
    return out
