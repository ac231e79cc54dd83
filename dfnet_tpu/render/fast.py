"""Fast test-time render path: fused transposed Pallas MLP sweeps +
structure-of-arrays XLA glue.

Drop-in replacement for render_rays at test time (perturb=0, no noise,
no gradients): the coarse sigma-only and fine MLP sweeps run as single
VMEM-resident kernels (ops/nerf_kernels.py) that take RAYS + z samples
and return channel-major raw outputs; sampling and compositing stay in
XLA but operate on clean (N, S) lanes-along-samples arrays only (the
array-of-struct (N, S, 9) layout costs a padded-lane relayout on every
consumer — measured +25 ms per 2M-point chunk).

Importance-sampling modes:
  - exact union (default; reference semantics, rendering.py:296-302 —
    and the fastest measured on v5e): importance samples from the
    placement CDF sorted together with the coarse z's;
  - blended CDF: all N_samples+N_importance fine z's drawn in one
    inverse-CDF pass from (1-lam)*cdf + lam*uniform, lam =
    N_samples/total — same marginal density as "uniform union
    importance" but SORTED by construction (PSNR-equal; QUALITY.md);
  - mono (experimental, blended only): sampling and fine+compositing
    each run as ONE kernel with no per-point XLA arrays at all
    (ops/nerf_kernels.proposal_z_rows / fine_composite_t). Measured
    slightly slower than two-kernel on v5e — the in-kernel inverse-CDF
    loop wastes VPU lanes on the ray axis — kept for future
    int8/mixed-precision variants where the balance shifts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from dfnet_tpu.models.nerfw import lookup_hist_embedding
from dfnet_tpu.ops import nerf_kernels as nk
from dfnet_tpu.render.sampling import sample_pdf, stratified_z_vals
from dfnet_tpu.render.volume import NeRFHModel, RenderSettings


@dataclass(frozen=True)
class FastNeRFH:
    """Kernel-packed NeRF-H for fused test-time rendering."""
    model: NeRFHModel
    packed_coarse: Dict
    packed_fine: Dict
    params: Dict                      # original params (per-ray partials)
    spec_coarse: nk.KernelSpec
    spec_fine: nk.KernelSpec
    packed_proposal: Optional[Dict] = None
    spec_proposal: Optional[nk.KernelSpec] = None

    @classmethod
    def pack(cls, params: Dict, model: NeRFHModel,
             use_proposal: bool = True) -> "FastNeRFH":
        F = model.embed_xyz.num_freqs

        def eff_skip(c):
            return c.skips[0] if c.skips and c.skips[0] < c.D else -1

        packed_p = spec_p = None
        if (use_proposal and model.cfg_proposal is not None
                and "proposal" in params):
            cp = model.cfg_proposal
            emb_p = model.embed_proposal or model.embed_xyz
            packed_p = nk.pack_coarse_t(params["proposal"], cp, emb_p)
            spec_p = nk.KernelSpec(D=cp.D, skip=eff_skip(cp),
                                   F=emb_p.num_freqs, fine=False,
                                   pe_mac=True)
        return cls(
            model=model,
            packed_coarse=nk.pack_coarse_t(params["coarse"], model.cfg_coarse,
                                           model.embed_xyz),
            packed_fine=nk.pack_fine_t(params["fine"], model.cfg_fine,
                                       model.embed_xyz),
            params=params,
            spec_coarse=nk.KernelSpec(D=model.cfg_coarse.D,
                                      skip=eff_skip(model.cfg_coarse),
                                      F=F, fine=False, pe_mac=True),
            spec_fine=nk.KernelSpec(D=model.cfg_fine.D,
                                    skip=eff_skip(model.cfg_fine),
                                    F=F, fine=True),
            packed_proposal=packed_p,
            spec_proposal=spec_p,
        )

    def ray_align(self, settings: RenderSettings,
                  n_fine: Optional[int] = None,
                  n_place: Optional[int] = None) -> int:
        """Ray-count alignment all kernels need (pad to a multiple)."""
        return kernel_ray_align(
            self.model, settings, n_fine, n_place,
            include_proposal=self.packed_proposal is not None)


def kernel_ray_align(model, settings: RenderSettings,
                     n_fine: Optional[int] = None,
                     n_place: Optional[int] = None,
                     include_proposal: bool = True) -> int:
    """Ray-count alignment the fused kernels need for this model/schedule.
    Tile geometry depends on each net's width (wide trunks halve the
    point tiles — nk.fine_tile_target) — LCM over every (S, W)
    combination that can run: the placement sweep on the proposal OR
    coarse net, the fine sweep, and the in-kernel sampler."""
    import math
    sp = n_place or settings.N_samples
    sf = n_fine or (settings.N_samples + settings.N_importance)
    widths = [model.cfg_coarse.W]
    if include_proposal and getattr(model, "cfg_proposal", None) is not None:
        widths.append(model.cfg_proposal.W)
    tiles = [nk.ray_tile(sf, model.cfg_fine.W)]
    for w in widths:
        tiles.append(nk.coarse_ray_tile(sp, w))
        tiles.append(nk.tile_geometry(
            sp, target=2048 if w <= nk.LANES else 1024)[0])
    a = 1
    for r in tiles:
        a = a * r // math.gcd(a, r)
    return a


def _shifted_cumprod_lanes(alphas):
    """[1, 1-a0, (1-a0)(1-a1), ...] along the last (sample) axis."""
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas[..., :-1]], -1)
    return jnp.cumprod(shifted, -1)


def sample_pdf_blend(bins, weights, n_total: int, lam: float):
    """One-pass inverse-CDF draw of n_total SORTED samples from
    (1-lam)*pdf(weights over bins) + lam*uniform(bins[0], bins[-1]).
    Gather-free masked-reduction scheme (see sampling.sample_pdf).
    bins: (N, M+1) sorted; weights: (N, M)."""
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
    span = bins[..., -1:] - bins[..., :1]
    cdf_u = (bins - bins[..., :1]) / jnp.maximum(span, 1e-10)
    cdf = (1.0 - lam) * cdf + lam * cdf_u

    u = jnp.linspace(0.0, 1.0, n_total)
    u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_total,))

    le = cdf[..., None, :] <= u[..., :, None]
    neg, pos = jnp.float32(-1e10), jnp.float32(1e10)
    cdf_e, bins_e = cdf[..., None, :], bins[..., None, :]
    cdf_b = jnp.max(jnp.where(le, cdf_e, neg), -1)
    bins_b = jnp.max(jnp.where(le, bins_e, neg), -1)
    cdf_a = jnp.min(jnp.where(le, pos, cdf_e), -1)
    bins_a = jnp.min(jnp.where(le, pos, bins_e), -1)
    cdf_b = jnp.where(cdf_b <= neg / 2, cdf[..., :1], cdf_b)
    bins_b = jnp.where(bins_b <= neg / 2, bins[..., :1], bins_b)
    cdf_a = jnp.where(cdf_a >= pos / 2, cdf[..., -1:], cdf_a)
    bins_a = jnp.where(bins_a >= pos / 2, bins[..., -1:], bins_a)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return jax.lax.stop_gradient(bins_b + t * (bins_a - bins_b))


def sample_pdf_culled(bins, weights, n_total: int, lam: float, q: float,
                      rng=None):
    """Empty-space-culled blended-CDF sampling.

    TPU-native static-shape equivalent of occupancy-grid empty-space
    culling + transmittance-based early ray termination (the reference
    has neither; its fine pass always covers [near, far] —
    rendering.py:296-302): per ray, restrict BOTH mixture components to
    the informative interval [z_lo, z_hi] — the [q, 1-q] quantile range
    of the proposal-weights CDF, padded by one bin — then draw n_total
    SORTED samples from (1-lam)*pdf(restricted weights) + lam*uniform
    (z_lo, z_hi) in one inverse-CDF pass. z < z_lo is leading empty
    space (< q of the mass); z > z_hi is space the ray only reaches
    with transmittance ~< q (terminated). Total truncated mass <= 2q,
    so the composite rgb error is bounded by ~2q. Same gather-free
    masked-reduction scheme as sample_pdf.

    bins: (N, M) sorted sample locations; weights: (N, M-1) proposal
    weights between them. Keeping n_total below N_samples+N_importance
    is what converts culling into throughput: unchanged local sample
    density over a ~2-3x shorter informative interval.

    rng: when given (train time), the inverse-CDF draw is STRATIFIED —
    u_i = (i + xi_i)/n with xi ~ U[0,1) per ray — matching the role of
    perturb=1 in the reference schedule; None = deterministic linspace
    (test time)."""
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (N, M)

    # [q, 1-q] quantiles of the weights CDF (masked-reduction inverse)
    uq = jnp.asarray([q, 1.0 - q], jnp.float32)
    uq = jnp.broadcast_to(uq, cdf.shape[:-1] + (2,))
    le = cdf[..., None, :] <= uq[..., :, None]            # (N, 2, M)
    neg, pos = jnp.float32(-1e10), jnp.float32(1e10)
    cdf_e, bins_e = cdf[..., None, :], bins[..., None, :]
    cdf_b = jnp.max(jnp.where(le, cdf_e, neg), -1)
    bins_b = jnp.max(jnp.where(le, bins_e, neg), -1)
    cdf_a = jnp.min(jnp.where(le, pos, cdf_e), -1)
    bins_a = jnp.min(jnp.where(le, pos, bins_e), -1)
    cdf_a = jnp.where(cdf_a >= pos / 2, cdf[..., -1:], cdf_a)
    bins_a = jnp.where(bins_a >= pos / 2, bins[..., -1:], bins_a)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    zq = bins_b + (uq - cdf_b) / denom * (bins_a - bins_b)  # (N, 2)

    pad = (bins[..., -1:] - bins[..., :1]) / (bins.shape[-1] - 1)
    z_lo = jnp.maximum(zq[..., 0:1] - pad, bins[..., :1])   # (N, 1)
    z_hi = jnp.minimum(zq[..., 1:2] + pad, bins[..., -1:])
    z_hi = jnp.maximum(z_hi, z_lo + 1e-4)

    # restricted mixture CDF over the same bin edges
    inside = (bins[..., 1:] >= z_lo) & (bins[..., :-1] <= z_hi)  # (N, M-1)
    wm = jnp.where(inside, weights, 0.0)
    pdf_m = wm / jnp.maximum(jnp.sum(wm, -1, keepdims=True), 1e-10)
    cdf_w = jnp.cumsum(pdf_m, -1)
    cdf_w = jnp.concatenate([jnp.zeros_like(cdf_w[..., :1]), cdf_w], -1)
    cdf_u = jnp.clip((bins - z_lo) / (z_hi - z_lo), 0.0, 1.0)
    cdf_mix = (1.0 - lam) * cdf_w + lam * cdf_u

    # every bin past z_hi shares one flat cdf value (cumsum adds exact
    # 0s; cdf_u clips at exactly 1), so any u >= that value tie-breaks
    # to the FAR PLANE bin (max over the tie), wasting one of n_total
    # samples per ray outside the culled interval. Scale u per ray by
    # the flat value itself (not a fixed 1-1e-6 nudge, which f32 cumsum
    # error in cdf_w can undercut) so u_max lands just inside z_hi.
    if rng is None:
        u = jnp.linspace(0.0, 1.0, n_total) * (1.0 - 1e-6)
    else:
        xi = jax.random.uniform(rng, cdf_mix.shape[:-1] + (n_total,))
        u = (jnp.arange(n_total, dtype=jnp.float32) + xi) / n_total
        u = u * (1.0 - 1e-6)
    u = u * cdf_mix[..., -1:]
    u = jnp.broadcast_to(u, cdf_mix.shape[:-1] + (n_total,))
    le = cdf_mix[..., None, :] <= u[..., :, None]
    cdf_e = cdf_mix[..., None, :]
    cdf_b = jnp.max(jnp.where(le, cdf_e, neg), -1)
    bins_b = jnp.max(jnp.where(le, bins_e, neg), -1)
    cdf_a = jnp.min(jnp.where(le, pos, cdf_e), -1)
    bins_a = jnp.min(jnp.where(le, pos, bins_e), -1)
    cdf_b = jnp.where(cdf_b <= neg / 2, cdf_mix[..., :1], cdf_b)
    bins_b = jnp.where(bins_b <= neg / 2, bins[..., :1], bins_b)
    cdf_a = jnp.where(cdf_a >= pos / 2, cdf_mix[..., -1:], cdf_a)
    bins_a = jnp.where(bins_a >= pos / 2, bins[..., -1:], bins_a)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return jax.lax.stop_gradient(bins_b + t * (bins_a - bins_b))


def composite_soa(raw16, z_all, white_bkgd: bool = False) -> Dict:
    """Test-time NeRF-W compositing from channel-major pre-activation
    raw (16, N, S) + z (N, S). Same math as volume.composite_nerfw
    (test_time=True): combined rgb, static-only recomposite for
    depth/disp (reference rendering.py:132-243). beta is not produced
    (the fast path is test-time only; beta feeds only the train loss)."""
    srgb = jax.nn.sigmoid(raw16[0:3])            # (3, N, S)
    ssig = jax.nn.softplus(raw16[3])             # (N, S)
    trgb = jax.nn.sigmoid(raw16[4:7])
    tsig = jax.nn.softplus(raw16[7])

    deltas = z_all[:, 1:] - z_all[:, :-1]
    deltas = jnp.concatenate([deltas, 1e2 * jnp.ones_like(deltas[:, :1])], -1)
    static_alphas = 1.0 - jnp.exp(-deltas * ssig)
    transient_alphas = 1.0 - jnp.exp(-deltas * tsig)
    alphas = 1.0 - jnp.exp(-deltas * (ssig + tsig))
    trans = _shifted_cumprod_lanes(alphas)
    weights = alphas * trans
    weights_sum = weights.sum(-1)

    static_w = static_alphas * trans
    transient_w = transient_alphas * trans
    static_rgb = jnp.stack([(static_w * srgb[c]).sum(-1) for c in range(3)], -1)
    if white_bkgd:
        static_rgb = static_rgb + (1.0 - weights_sum[:, None])
    transient_rgb = jnp.stack([(transient_w * trgb[c]).sum(-1)
                               for c in range(3)], -1)
    rgb = static_rgb + transient_rgb

    # static-only recomposite drives depth/disp at test time
    s_trans = _shifted_cumprod_lanes(static_alphas)
    static_w_ = static_alphas * s_trans
    depth = (static_w_ * z_all).sum(-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(weights_sum, 1e-10))
    return {"rgb": rgb, "disp": disp, "acc": weights_sum, "depth": depth,
            "rgb_static_only": jnp.stack(
                [(static_w_ * srgb[c]).sum(-1) for c in range(3)], -1)}


def _per_ray_conditioning(fast: FastNeRFH, rays_d, hist):
    """(N, W) per-ray conditioning rows. hist may be (1, HB) for a
    whole-image render — the embedding GATHER (slow on TPU) then runs
    once and broadcasts, instead of gathering N identical rows
    (measured 0.9 ms/16K-ray chunk for the gathered form)."""
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dir_emb = fast.model.embed_dir(viewdirs)
    a_emb = lookup_hist_embedding(fast.params["embedding_a"], hist)
    t_emb = lookup_hist_embedding(fast.params["embedding_t"], hist)
    return nk.per_ray_row(fast.params["fine"], fast.model.cfg_fine,
                          dir_emb, a_emb, t_emb)


def render_rays_fast(fast: FastNeRFH, rays_o, rays_d, hist,
                     settings: RenderSettings, exact_union: bool = True,
                     mono: Optional[bool] = None,
                     cull_q: float = 0.0, n_fine: Optional[int] = None,
                     n_place: Optional[int] = None,
                     fuse_composite: bool = False,
                     interpret: Optional[bool] = None) -> Dict:
    """Test-time render of a ray batch through the fused kernels.

    Matches render_rays(test settings) up to bf16 kernel rounding when
    exact_union=True; the blended-CDF mode changes only the fine-sample
    PLACEMENT (same marginal density, sorted by construction; PSNR
    validated equal in QUALITY.md). `mono` (opt-in; requires a packed
    proposal, exact_union=False and lindisp=False) runs the whole
    pipeline in TWO kernel launches: sampling (proposal sweep -> sigma
    -> weights -> blended inverse CDF) and fine sweep + compositing,
    with no per-point XLA arrays at all — kept experimental because the
    two-kernel path measured faster on v5e. Ray count must be a
    multiple of fast.ray_align().

    cull_q > 0 selects the CULLED sampler (sample_pdf_culled — empty-
    space culling + early termination as per-ray interval restriction),
    usually with n_fine < N_samples+N_importance; PSNR-vs-speed points
    are tabulated in QUALITY.md. fuse_composite runs the fine sweep and
    the full NeRF-W composite as ONE kernel (fine_composite_t) instead
    of fine kernel + XLA SoA composite."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if cull_q <= 0.0 and exact_union and (n_fine or n_place):
        # The exact-union schedule's fine count is structural (the S
        # placement z's unioned with N_importance importance draws) —
        # honoring n_fine/n_place here would desync the fine tile from
        # ray_align. They are knobs of the culled/blended schedules.
        raise ValueError(
            "n_fine/n_place (render_fine_total/render_place_samples) "
            "require cull_q > 0 or exact_union=False; the exact-union "
            "schedule always renders N_samples+N_importance samples")
    model = fast.model
    n = rays_o.shape[0]
    # n_place: sample count of the PLACEMENT sweep (proposal sigma grid
    # + CDF bins); decoupled from N_samples when culling (the tiny
    # proposal resolves the informative interval at 48 as well as 64)
    S = n_place or settings.N_samples
    # the mono sampling kernel builds a linear-in-z uniform grid only
    # (proposal_z_rows) — fall back to the two-kernel path under lindisp
    mono_ok = (fast.packed_proposal is not None and not exact_union
               and not settings.lindisp)
    if mono is None:
        # measured on v5e: the two-kernel path wins — XLA's masked-
        # reduction inverse CDF streams at full HBM bandwidth while the
        # in-kernel loop wastes VPU lanes on the ray axis. Kept as an
        # option for future int8/mixed variants.
        mono = False
    if mono and mono_ok:
        n_total = S + settings.N_importance
        dpt = _per_ray_conditioning(fast, rays_d, hist)
        z_rows = nk.proposal_z_rows(
            fast.packed_proposal, rays_o, rays_d, fast.spec_proposal, S,
            n_total, float(settings.near), float(settings.far),
            lam=S / n_total, interpret=interpret)
        out = nk.fine_composite_t(fast.packed_fine, rays_o, rays_d, z_rows,
                                  dpt, fast.spec_fine, interpret=interpret)
        rgb = jnp.transpose(out[0:3])
        acc = out[3]
        depth = out[4]
        if settings.white_bkgd:
            rgb = rgb + (1.0 - acc)[:, None]
        disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
        return {"rgb": rgb, "disp": disp, "acc": acc, "depth": depth,
                "rgb_static_only": jnp.transpose(out[5:8])}
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    # sample placement: trained proposal sampler when available (same
    # uniform grid, ~15x cheaper sigma sweep), else the coarse NeRF
    if fast.packed_proposal is not None:
        sig_pre = nk.coarse_sigma_t(fast.packed_proposal, rays_o, rays_d,
                                    fast.spec_proposal, S,
                                    float(settings.near), float(settings.far),
                                    settings.lindisp, interpret=interpret)
    else:
        sig_pre = nk.coarse_sigma_t(fast.packed_coarse, rays_o, rays_d,
                                    fast.spec_coarse, S,
                                    float(settings.near), float(settings.far),
                                    settings.lindisp, interpret=interpret)
    sigma = jax.nn.softplus(sig_pre)                          # (N, S)
    near = jnp.full((n, 1), settings.near, jnp.float32)
    far = jnp.full((n, 1), settings.far, jnp.float32)
    z_vals = stratified_z_vals(near, far, S, None, settings.lindisp, 0.0)

    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = jnp.concatenate([deltas, 1e2 * jnp.ones_like(deltas[:, :1])], -1)
    alphas = 1.0 - jnp.exp(-deltas * sigma)
    weights = alphas * _shifted_cumprod_lanes(alphas)

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    n_total = n_fine or (settings.N_samples + settings.N_importance)
    if cull_q > 0.0:
        lam = settings.N_samples / (settings.N_samples
                                    + settings.N_importance)
        z_all = sample_pdf_culled(z_mid, weights[..., 1:-1], n_total,
                                  lam=lam, q=cull_q)
    elif exact_union:
        z_samples = sample_pdf(z_mid, weights[..., 1:-1],
                               settings.N_importance, None, det=True)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
    else:
        z_all = sample_pdf_blend(z_mid, weights[..., 1:-1], n_total,
                                 lam=S / n_total)

    cfgf = model.cfg_fine
    dir_emb = model.embed_dir(viewdirs)
    a_emb = lookup_hist_embedding(fast.params["embedding_a"], hist)
    t_emb = lookup_hist_embedding(fast.params["embedding_t"], hist)
    dpt = nk.per_ray_row(fast.params["fine"], cfgf, dir_emb, a_emb, t_emb)

    if fuse_composite:
        S_f = z_all.shape[-1]
        z_rows = jnp.zeros((8, n * S_f), jnp.float32)
        z_rows = z_rows.at[0].set(z_all.reshape(-1))
        out = nk.fine_composite_t(fast.packed_fine, rays_o, rays_d, z_rows,
                                  dpt, fast.spec_fine, interpret=interpret)
        rgb = jnp.transpose(out[0:3])
        acc = out[3]
        depth = out[4]
        if settings.white_bkgd:
            rgb = rgb + (1.0 - acc)[:, None]
        disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
        return {"rgb": rgb, "disp": disp, "acc": acc, "depth": depth,
                "rgb_static_only": jnp.transpose(out[5:8])}

    raw16 = nk.fine_raw_t(fast.packed_fine, rays_o, rays_d, z_all, dpt,
                          fast.spec_fine, interpret=interpret)
    return composite_soa(raw16, z_all, white_bkgd=settings.white_bkgd)


def cull_schedule_kwargs(cfg) -> Dict:
    """cfg.render_* flags as render kwargs, gated so n_fine/n_place are
    only forwarded when the culled sampler is on — under the default
    exact-union schedule they are meaningless and render_rays_fast
    rejects them (the union's fine count is structural)."""
    q = float(cfg.render_cull_q or 0.0)
    if q <= 0.0:
        return {"cull_q": 0.0, "n_fine": None, "n_place": None}
    return {"cull_q": q, "n_fine": cfg.render_fine_total or None,
            "n_place": cfg.render_place_samples or None}


# On the CPU backend the kernels run in (slow) interpret mode — only
# useful for parity tests, so production call sites skip the fast path
# there. Tests flip this to exercise the integration on CPU.
ALLOW_INTERPRET_PATH = False


def fast_path_supported(model, settings: RenderSettings) -> bool:
    """Whether the fused kernels can serve this model/settings combo
    (NeRF-H rgb model, tileable sample counts, full-frequency PE).

    Note the precision contract: the kernels always run bf16 matmuls
    with f32 accumulation regardless of --precision (validated within
    0.05 dB of the f32 XLA path in QUALITY.md); pass
    --fast_render false for strictly-f32 evaluation."""
    if jax.default_backend() == "cpu" and not ALLOW_INTERPRET_PATH:
        return False
    if not isinstance(model, NeRFHModel):
        return False
    if model.cfg_fine.out_ch != 3 or settings.N_importance <= 0:
        return False
    # feature streams narrower than 64 sublanes trigger pathological
    # (many-minute) Mosaic compiles — tiny debug MLPs keep the XLA path
    # (interpret mode on CPU has no such pathology; tests keep coverage)
    if jax.default_backend() != "cpu":
        widths = [model.cfg_coarse.W, model.cfg_fine.W]
        if model.cfg_proposal is not None:
            widths.append(model.cfg_proposal.W)
        if min(widths) < 64:
            return False
    # wide MLPs: the per-ray conditioning rows (width W) ride taller
    # (W, LANES) expansion tiles and point tiles halve for VMEM —
    # supported for lane-aligned widths up to 2*LANES (W=256 validated;
    # beyond that the VMEM budget is unverified)
    for w in (model.cfg_coarse.W, model.cfg_fine.W):
        if w > nk.LANES and (w % nk.LANES != 0 or w > 2 * nk.LANES):
            return False
    if model.embed_xyz.windowed or model.embed_dir.windowed:
        return False  # epoch-dependent frequency window -> XLA path
    if 6 * model.embed_xyz.num_freqs + 3 > nk.LANES:
        return False
    try:
        nk.tile_geometry(settings.N_samples)
        nk.tile_geometry(settings.N_samples + settings.N_importance)
    except ValueError:
        return False
    return True


def render_image_fast(params: Dict, model: NeRFHModel, c2w, hist,
                      H: int, W: int, focal: float,
                      settings: RenderSettings, chunk: int = 1024 * 8,
                      exact_union: bool = True, use_proposal: bool = True,
                      cull_q: float = 0.0, n_fine: Optional[int] = None,
                      n_place: Optional[int] = None,
                      fuse_composite: bool = False,
                      interpret: Optional[bool] = None) -> Dict:
    """Full-image render through the fused kernels (test-time drop-in
    for volume.render_image: same output dict keys rgb/disp/acc).
    Packs the weights in-trace (cheap transposes) so it can be jitted
    with params as an argument."""
    from dfnet_tpu.render.rays import get_rays

    fast = FastNeRFH.pack(params, model, use_proposal=use_proposal)
    align = fast.ray_align(settings, n_fine, n_place)
    chunk = max(chunk // align, 1) * align
    rays_o, rays_d = get_rays(H, W, focal, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    n = rays_o.shape[0]
    n_pad = -n % chunk
    rays_o = jnp.concatenate([rays_o, jnp.zeros((n_pad, 3), rays_o.dtype)], 0)
    rays_d = jnp.concatenate([rays_d, jnp.ones((n_pad, 3), rays_d.dtype)], 0)
    n_chunks = (n + n_pad) // chunk
    hist_b = hist[None]            # (1, HB): uniform-hist gather-once path

    def body(args):
        ro, rd = args
        r = render_rays_fast(fast, ro, rd, hist_b, settings,
                             exact_union=exact_union, cull_q=cull_q,
                             n_fine=n_fine, n_place=n_place,
                             fuse_composite=fuse_composite,
                             interpret=interpret)
        return {"rgb": r["rgb"], "disp": r["disp"], "acc": r["acc"]}

    res = jax.lax.map(body, (rays_o.reshape(n_chunks, chunk, 3),
                             rays_d.reshape(n_chunks, chunk, 3)))
    out = {}
    for k, v in res.items():
        flat = v.reshape((n_chunks * chunk,) + v.shape[2:])[:n]
        out[k] = flat.reshape((H, W) + v.shape[2:])
    return out
