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

    # batched searchsorted(right): count of cdf entries <= u. A broadcast
    # comparison (N, N_importance, M+1) is pure VPU work and orders of
    # magnitude faster on TPU than a vmapped binary search.
    inds = jnp.sum(cdf[..., None, :] <= u[..., :, None], axis=-1).astype(jnp.int32)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_b = jnp.take_along_axis(cdf, below, -1)
    cdf_a = jnp.take_along_axis(cdf, above, -1)
    bins_b = jnp.take_along_axis(bins, below, -1)
    bins_a = jnp.take_along_axis(bins, above, -1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    samples = bins_b + t * (bins_a - bins_b)
    return jax.lax.stop_gradient(samples)
