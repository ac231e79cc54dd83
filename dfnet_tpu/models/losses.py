"""NeRF-W training losses (Eq. 13 of the NeRF-W paper).

Functional parity: /root/reference/script/models/losses.py:19-59.
"""

from __future__ import annotations

from typing import Dict

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
