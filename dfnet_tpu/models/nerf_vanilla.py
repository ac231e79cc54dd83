"""Vanilla NeRF MLP (the reference's non-NeRFH mode).

Architecture parity (/root/reference/script/models/nerf.py:187-239):
D linear layers on the xyz encoding with ReLU, skip-concat of the input
AFTER layer i's ReLU for i in skips (NOTE: different from NeRFW, which
concatenates BEFORE the skip layer); with viewdirs: alpha head from the
trunk, feature_linear → concat views → one W//2 layer → rgb. Outputs are
RAW (sigmoid/relu applied in compositing, rendering.py:67-130).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from dfnet_tpu.models.nerfw import _dense, _torch_linear_init


@dataclass(frozen=True)
class VanillaNeRFConfig:
    D: int = 8
    W: int = 256
    skips: tuple = (4,)
    in_xyz: int = 63
    in_dir: int = 27
    use_viewdirs: bool = True
    output_ch: int = 4
    compute_dtype: jnp.dtype = jnp.float32


def init_nerf_params(key, cfg: VanillaNeRFConfig) -> Dict:
    keys = jax.random.split(key, cfg.D + 5)
    ki = iter(keys)
    p: Dict = {}
    for i in range(cfg.D):
        # layer i reads W (or W+in_xyz if the PREVIOUS layer index was a skip)
        if i == 0:
            fan_in = cfg.in_xyz
        elif (i - 1) in cfg.skips:
            fan_in = cfg.W + cfg.in_xyz
        else:
            fan_in = cfg.W
        p[f"pts_{i}"] = _torch_linear_init(next(ki), fan_in, cfg.W)
    if cfg.use_viewdirs:
        p["feature"] = _torch_linear_init(next(ki), cfg.W, cfg.W)
        p["alpha"] = _torch_linear_init(next(ki), cfg.W, 1)
        p["views_0"] = _torch_linear_init(next(ki), cfg.W + cfg.in_dir, cfg.W // 2)
        p["rgb"] = _torch_linear_init(next(ki), cfg.W // 2, 3)
    else:
        p["output"] = _torch_linear_init(next(ki), cfg.W, cfg.output_ch)
    return p


def nerf_apply_rays(params: Dict, cfg: VanillaNeRFConfig,
                    xyz_emb: jnp.ndarray,               # (N, S, in_xyz)
                    dir_emb: Optional[jnp.ndarray] = None  # (N, in_dir)
                    ) -> jnp.ndarray:
    """Raw outputs (N, S, 4): [rgb_raw, sigma_raw] (or output_ch w/o
    viewdirs). Per-ray viewdir input handled by split matmul (no
    per-sample broadcast materialization)."""
    dt = cfg.compute_dtype
    h = xyz_emb
    for i in range(cfg.D):
        h = jax.nn.relu(_dense(params[f"pts_{i}"], h, dt))
        if i in cfg.skips:
            h = jnp.concatenate([xyz_emb, h], -1)
    if not cfg.use_viewdirs:
        return _dense(params["output"], h, dt)

    alpha = _dense(params["alpha"], h, dt)
    feature = _dense(params["feature"], h, dt)
    wv = params["views_0"]["w"]
    per_ray = jnp.dot(dir_emb.astype(dt), wv[cfg.W:].astype(dt),
                      preferred_element_type=jnp.float32)
    hh = jnp.dot(feature.astype(dt), wv[:cfg.W].astype(dt),
                 preferred_element_type=jnp.float32)
    hh = jax.nn.relu(hh + per_ray[:, None, :] + params["views_0"]["b"])
    rgb = _dense(params["rgb"], hh, dt)
    return jnp.concatenate([rgb, alpha], -1)


def vanilla_state_dict_to_params(sd: Dict, D: int = 8) -> Dict:
    """Reference torch NeRF state_dict → our params (for .tar porting)."""
    import numpy as np

    def lin(name):
        return {"w": np.ascontiguousarray(np.asarray(sd[f"{name}.weight"]).T),
                "b": np.asarray(sd[f"{name}.bias"])}

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    p = {f"pts_{i}": lin(f"pts_linears.{i}") for i in range(D)}
    if "feature_linear.weight" in sd:
        p["feature"] = lin("feature_linear")
        p["alpha"] = lin("alpha_linear")
        p["views_0"] = lin("views_linears.0")
        p["rgb"] = lin("rgb_linear")
    else:
        p["output"] = lin("output_linear")
    return p
