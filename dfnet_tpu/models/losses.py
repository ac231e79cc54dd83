"""NeRF-W training losses (Eq. 13 of the NeRF-W paper).

Functional parity: /root/reference/script/models/losses.py:19-59.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse):
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x):
    import numpy as np

    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def nerfw_loss(results: Dict, target, coef: float = 1.0, lambda_u: float = 0.01) -> Dict:
    """c_l: coarse MSE/2; f_l: fine MSE attenuated by beta²; b_l:
    3+log(beta); s_l: λ_u·mean(transient σ). Keys follow the reference."""
    ret = {}
    ret["c_l"] = 0.5 * jnp.mean((results["rgb0"] - target) ** 2)
    if "rgb" in results and results["rgb"] is not None:
        if "beta" not in results or results["beta"] is None:
            ret["f_l"] = 0.5 * jnp.mean((results["rgb"] - target) ** 2)
        else:
            beta = results["beta"][:, None]
            ret["f_l"] = jnp.mean((results["rgb"] - target) ** 2 / (2.0 * beta**2))
            ret["b_l"] = 3.0 + jnp.mean(jnp.log(results["beta"]))
            ret["s_l"] = lambda_u * jnp.mean(results["transient_sigmas"])
    return {k: coef * v for k, v in ret.items()}


def color_loss(results: Dict, target, coef: float = 1.0):
    loss = jnp.mean((results["rgb0"] - target) ** 2)
    if "rgb" in results:
        loss = loss + jnp.mean((results["rgb"] - target) ** 2)
    return coef * loss


def proposal_bound_loss(w_prop, z_vals, w_fine, z_all):
    """Interlevel bound loss for the tiny proposal sampler (mip-NeRF 360
    Eq. 13 adapted to the shared uniform coarse grid; arXiv 2111.12077):
    the proposal's mass in each coarse interval must upper-bound the
    (stop-gradient) fine mass landing there — only the proposal learns.

    w_prop: (N, S) proposal weights at the uniform z_vals (N, S);
    w_fine: (N, Sf) fine weights at z_all (N, Sf).
    """
    lower = z_vals                                        # (N, S)
    upper = jnp.concatenate(
        [z_vals[:, 1:], jnp.full_like(z_vals[:, :1], 1e10)], -1)
    z = jax.lax.stop_gradient(z_all)
    wf = jax.lax.stop_gradient(w_fine)
    inside = (z[:, None, :] >= lower[..., None]) & (z[:, None, :] < upper[..., None])
    w_in = jnp.sum(jnp.where(inside, wf[:, None, :], 0.0), -1)  # (N, S)
    excess = jnp.maximum(w_in - w_prop, 0.0)
    return jnp.mean(excess ** 2 / (w_prop + 1e-2))
