"""Ray sampling: stratified coarse samples and inverse-CDF hierarchical
(importance) resampling.

Functional parity: /root/reference/script/models/rendering.py:24-65
(sample_pdf) and :269-285 (stratified perturbation). Fully batched jnp —
no chunk loops; the caller shards/chunks the ray axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(near, far, N_samples: int, rng=None, lindisp: bool = False,
                      perturb: float = 0.0):
    """near/far: (N_rays, 1) → z_vals (N_rays, N_samples).

    Linear in depth (or disparity); with perturb>0, uniform jitter
    within each inter-sample interval.
    """
    t = jnp.linspace(0.0, 1.0, N_samples)
    if lindisp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    if perturb > 0.0 and rng is not None:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], -1)
        lower = jnp.concatenate([z[..., :1], mids], -1)
        u = jax.random.uniform(rng, z.shape)
        z = lower + (upper - lower) * u
    return z


def sample_pdf(bins, weights, N_importance: int, rng=None, det: bool = False):
    """Inverse-CDF sampling of N_importance points from the piecewise-
    constant pdf over `bins`.

    bins: (N_rays, M+1) — here the coarse z midpoints; weights: (N_rays, M).
    Weights/CDF are treated as constants (stop_gradient), matching the
    reference's detached searchsorted + z_samples.detach()
    (rendering.py:51,302).
    """
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (N, M+1)

    if det or rng is None:
        u = jnp.linspace(0.0, 1.0, N_importance)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_importance,))
    else:
        u = jax.random.uniform(rng, cdf.shape[:-1] + (N_importance,))

    # Gather-free inverse CDF. TPU gathers (take_along_axis) are ~50x
    # slower than VPU reductions here, so instead of indexing cdf/bins at
    # searchsorted positions we read them with masked reductions over a
    # broadcast comparison (N, N_importance, M+1):
    #   below = last k with cdf[k] <= u   → max over the prefix mask
    #   above = first k with cdf[k] >  u  → min over the suffix mask
    # Both cdf and bins are sorted along the last axis, so prefix-max /
    # suffix-min reproduce the indexed values exactly.
    le = cdf[..., None, :] <= u[..., :, None]            # (N, I, M+1)
    neg = jnp.float32(-1e10)
    pos = jnp.float32(1e10)
    cdf_e = cdf[..., None, :]
    bins_e = bins[..., None, :]

    cdf_b = jnp.max(jnp.where(le, cdf_e, neg), -1)
    bins_b = jnp.max(jnp.where(le, bins_e, neg), -1)
    cdf_a = jnp.min(jnp.where(le, pos, cdf_e), -1)
    bins_a = jnp.min(jnp.where(le, pos, bins_e), -1)
    # clamp semantics of the reference (below >= 0, above <= M):
    # u < cdf[0]=0 never happens (u >= 0); u >= cdf[-1] leaves the
    # "above" masks empty → fall back to the last entry.
    cdf_b = jnp.where(cdf_b <= neg / 2, cdf[..., :1], cdf_b)
    bins_b = jnp.where(bins_b <= neg / 2, bins[..., :1], bins_b)
    cdf_a = jnp.where(cdf_a >= pos / 2, cdf[..., -1:], cdf_a)
    bins_a = jnp.where(bins_a >= pos / 2, bins[..., -1:], bins_a)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    samples = bins_b + t * (bins_a - bins_b)
    return jax.lax.stop_gradient(samples)
