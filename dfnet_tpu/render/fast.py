"""Fast test-time render path using the fused Pallas kernels.

Drop-in replacement for render_rays at test time (perturb=0, no noise,
no gradients): identical sampling + compositing math, with the two MLP
sweeps (coarse sigma-only, fine full) executed by the fused VMEM kernels
of ops/fused_nerfw. Per-ray conditioning partials are computed once per
ray and expanded to points in bf16.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from dfnet_tpu.models.nerfw import lookup_hist_embedding
from dfnet_tpu.ops.fused_nerfw import (
    fused_coarse_sigma,
    fused_fine_raw,
    pack_fused_params,
    per_ray_partials,
)
from dfnet_tpu.render.sampling import sample_pdf, stratified_z_vals
from dfnet_tpu.render.volume import NeRFHModel, RenderSettings, composite_nerfw


@dataclass(frozen=True)
class FusedNeRFH:
    """Kernel-packed weights for the fused test-time renderer."""
    model: NeRFHModel
    packed_coarse: Dict
    packed_fine: Dict
    params: Dict  # original params (for per-ray partials + embeddings)

    @classmethod
    def pack(cls, params: Dict, model: NeRFHModel) -> "FusedNeRFH":
        return cls(
            model=model,
            packed_coarse=pack_fused_params(params["coarse"], model.cfg_coarse,
                                            model.embed_xyz, fine=False),
            packed_fine=pack_fused_params(params["fine"], model.cfg_fine,
                                          model.embed_xyz, fine=True),
            params=params,
        )


RAY_CHUNK = 4096  # rays per internal chunk (bounds the expanded-partial buffers)


def render_rays_fused(fused: FusedNeRFH, rays_o, rays_d, hist,
                      settings: RenderSettings, interpret=None) -> Dict:
    """Test-time render of a ray batch. Internally chunks the ray axis
    with lax.map when the batch exceeds RAY_CHUNK (the per-point
    expansion of the conditioning partials is what bounds memory)."""
    n = rays_o.shape[0]
    if n > RAY_CHUNK and n % RAY_CHUNK == 0:
        nch = n // RAY_CHUNK

        def body(args):
            ro, rd, h = args
            return _render_chunk(fused, ro, rd, h, settings, interpret)

        res = jax.lax.map(body, (rays_o.reshape(nch, RAY_CHUNK, 3),
                                 rays_d.reshape(nch, RAY_CHUNK, 3),
                                 hist.reshape(nch, RAY_CHUNK, -1)))
        return {k: v.reshape((n,) + v.shape[2:]) for k, v in res.items()}
    return _render_chunk(fused, rays_o, rays_d, hist, settings, interpret)


def _render_chunk(fused: FusedNeRFH, rays_o, rays_d, hist,
                  settings: RenderSettings, interpret=None) -> Dict:
    model = fused.model
    n = rays_o.shape[0]
    S = settings.N_samples
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = jnp.full((n, 1), settings.near, rays_o.dtype)
    far = jnp.full((n, 1), settings.far, rays_o.dtype)

    z_vals = stratified_z_vals(near, far, S, None, settings.lindisp, 0.0)
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]).reshape(-1, 3)

    D, skip = model.cfg_coarse.D, model.cfg_coarse.skips[0]
    sigma = fused_coarse_sigma(fused.packed_coarse, pts, D=D, skip=skip,
                               interpret=interpret).reshape(n, S, 1)
    comp_c = composite_nerfw(sigma, z_vals, output_transient=False, sigma_only=True)

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(z_mid, comp_c["weights"][..., 1:-1],
                           settings.N_importance, None, det=True)
    z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
    n_all = S + settings.N_importance
    pts_f = (rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]).reshape(-1, 3)

    cfgf = model.cfg_fine
    dir_emb = model.embed_dir(viewdirs)
    a_emb = lookup_hist_embedding(fused.params["embedding_a"], hist)
    t_emb = lookup_hist_embedding(fused.params["embedding_t"], hist)
    dp, tp = per_ray_partials(fused.params["fine"], cfgf, dir_emb, a_emb, t_emb)
    dp_pts = jnp.repeat(dp.astype(jnp.bfloat16), n_all, axis=0)
    tp_pts = jnp.repeat(tp.astype(jnp.bfloat16), n_all, axis=0)

    raw_f = fused_fine_raw(fused.packed_fine, pts_f, dp_pts, tp_pts,
                           D=cfgf.D, skip=cfgf.skips[0], interpret=interpret)
    raw_f = raw_f.reshape(n, n_all, 9)
    comp_f = composite_nerfw(raw_f, z_all, output_transient=True,
                             beta_min=cfgf.beta_min,
                             white_bkgd=settings.white_bkgd,
                             test_time=True, out_ch=cfgf.out_ch)
    return {"rgb": comp_f["rgb"], "disp": comp_f["disp"], "acc": comp_f["acc"],
            "depth": comp_f["depth"]}
