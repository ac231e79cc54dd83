"""NeRF-W / NeRF-Hist MLPs as pure-functional pytrees.

Architecture parity (reference: /root/reference/script/models/nerfw.py:220-354):
  - coarse = plain NeRF trunk: D linear+ReLU xyz layers (skip concat of
    the xyz encoding at layer index `skips`), softplus sigma head,
    xyz_final → [dir encoding (+appearance)] → W//2 → sigmoid rgb.
  - fine additionally consumes an appearance embedding in the direction
    branch and has a 4-layer transient head emitting (rgb, sigma, beta).
  - histogram embeddings: rows of (N_vocab, 5) / (N_vocab, 2) tables
    indexed by the 10-bin luminance histogram, flattened to 50/20 dims
    (nerfw.py:385-391, 69-81).

Everything is jnp; params are nested dicts of {'w','b'} suitable for
jax.grad / optax / pjit sharding. Matmuls optionally run in bfloat16
(MXU-native) with float32 accumulation via the `compute_dtype` option.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NeRFWConfig:
    D: int = 8
    W: int = 128
    skips: tuple = (4,)
    in_xyz: int = 63
    in_dir: int = 27
    in_a: int = 50          # appearance embedding dim (fine only)
    in_t: int = 20          # transient embedding dim (fine only)
    encode_appearance: bool = False
    encode_transient: bool = False
    beta_min: float = 0.1
    out_ch: int = 3         # >3 = feature field (giraffe-style) — linear rgb head
    compute_dtype: jnp.dtype = jnp.float32


def _torch_linear_init(key, fan_in: int, fan_out: int):
    """Match torch.nn.Linear default init: kaiming-uniform weights
    (bound 1/sqrt(fan_in)) and uniform bias with the same bound."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_nerfw_params(key, cfg: NeRFWConfig) -> Dict:
    """Create the parameter pytree for one (coarse or fine) NeRFW MLP."""
    keys = jax.random.split(key, 32)
    ki = iter(keys)
    p: Dict = {}
    in_a = cfg.in_a if cfg.encode_appearance else 0
    for i in range(cfg.D):
        fan_in = cfg.in_xyz if i == 0 else (cfg.W + cfg.in_xyz if i in cfg.skips else cfg.W)
        p[f"xyz_{i}"] = _torch_linear_init(next(ki), fan_in, cfg.W)
    p["xyz_final"] = _torch_linear_init(next(ki), cfg.W, cfg.W)
    p["dir"] = _torch_linear_init(next(ki), cfg.W + cfg.in_dir + in_a, cfg.W // 2)
    p["static_sigma"] = _torch_linear_init(next(ki), cfg.W, 1)
    p["static_rgb"] = _torch_linear_init(next(ki), cfg.W // 2, cfg.out_ch)
    if cfg.encode_transient:
        p["trans_0"] = _torch_linear_init(next(ki), cfg.W + cfg.in_t, cfg.W // 2)
        for i in (1, 2, 3):
            p[f"trans_{i}"] = _torch_linear_init(next(ki), cfg.W // 2, cfg.W // 2)
        p["trans_sigma"] = _torch_linear_init(next(ki), cfg.W // 2, 1)
        p["trans_rgb"] = _torch_linear_init(next(ki), cfg.W // 2, cfg.out_ch)
        p["trans_beta"] = _torch_linear_init(next(ki), cfg.W // 2, 1)
    return p


def _dense(p, x, dtype):
    w = p["w"].astype(dtype)
    return jnp.dot(x.astype(dtype), w, preferred_element_type=jnp.float32) + p["b"]


def nerfw_apply(
    params: Dict,
    cfg: NeRFWConfig,
    xyz_emb: jnp.ndarray,                 # (N, in_xyz)
    dir_emb: Optional[jnp.ndarray] = None,  # (N, in_dir)
    a_emb: Optional[jnp.ndarray] = None,    # (N, in_a)
    t_emb: Optional[jnp.ndarray] = None,    # (N, in_t)
    sigma_only: bool = False,
    output_transient: bool = False,
) -> jnp.ndarray:
    """Returns, concatenated along the last axis:
      sigma_only:        (N, 1)  static_sigma
      output_transient:  (N, 2*out_ch+3) static_rgb, static_sigma,
                         transient_rgb, transient_sigma, transient_beta
      else:              (N, out_ch+1) static_rgb, static_sigma
    """
    dt = cfg.compute_dtype
    h = xyz_emb
    for i in range(cfg.D):
        if i in cfg.skips:
            h = jnp.concatenate([xyz_emb, h], -1)
        h = jax.nn.relu(_dense(params[f"xyz_{i}"], h, dt))
    static_sigma = jax.nn.softplus(_dense(params["static_sigma"], h, dt))
    if sigma_only:
        return static_sigma

    xyz_final = _dense(params["xyz_final"], h, dt)
    dir_in = [xyz_final, dir_emb]
    if cfg.encode_appearance:
        dir_in.append(a_emb)
    d = jax.nn.relu(_dense(params["dir"], jnp.concatenate(dir_in, -1), dt))
    rgb = _dense(params["static_rgb"], d, dt)
    if cfg.out_ch == 3:
        rgb = jax.nn.sigmoid(rgb)
    static = jnp.concatenate([rgb, static_sigma], -1)
    if not output_transient:
        return static

    t = jnp.concatenate([xyz_final, t_emb], -1)
    for i in range(4):
        t = jax.nn.relu(_dense(params[f"trans_{i}"], t, dt))
    t_sigma = jax.nn.softplus(_dense(params["trans_sigma"], t, dt))
    t_rgb = _dense(params["trans_rgb"], t, dt)
    if cfg.out_ch == 3:
        t_rgb = jax.nn.sigmoid(t_rgb)
    t_beta = jax.nn.softplus(_dense(params["trans_beta"], t, dt))
    return jnp.concatenate([static, t_rgb, t_sigma, t_beta], -1)


def nerfw_apply_rays(
    params: Dict,
    cfg: NeRFWConfig,
    xyz_emb: jnp.ndarray,                   # (N, S, in_xyz) — per point
    dir_emb: Optional[jnp.ndarray] = None,  # (N, in_dir)    — per ray
    a_emb: Optional[jnp.ndarray] = None,    # (N, in_a)      — per ray
    t_emb: Optional[jnp.ndarray] = None,    # (N, in_t)      — per ray
    sigma_only: bool = False,
    output_transient: bool = False,
) -> jnp.ndarray:
    """Ray-structured apply: algebraically identical to nerfw_apply but
    per-ray inputs (viewdirs, appearance/transient embeddings) are NOT
    broadcast to every sample. The concatenated dense layers split into
    per-point and per-ray partial matmuls:
        [h, d, a] @ W = h @ W_h + (d @ W_d + a @ W_a)[:, None, :]
    cutting both HBM traffic (no (N·S, dim) repeat materialization) and
    FLOPs (the per-ray part is computed once per ray, not per sample).
    """
    dt = cfg.compute_dtype
    x0 = xyz_emb.astype(dt)
    h = x0
    for i in range(cfg.D):
        if i in cfg.skips:
            # split matmul instead of concat([xyz, h]) — avoids
            # materializing the (P, in_xyz+W) tensor
            w = params[f"xyz_{i}"]["w"]
            y = (jnp.dot(x0, w[:cfg.in_xyz].astype(dt),
                         preferred_element_type=jnp.float32)
                 + jnp.dot(h, w[cfg.in_xyz:].astype(dt),
                           preferred_element_type=jnp.float32)
                 + params[f"xyz_{i}"]["b"])
        else:
            y = _dense(params[f"xyz_{i}"], h, dt)
        h = jax.nn.relu(y)
        if dt != jnp.float32:
            h = h.astype(dt)
    W = cfg.W
    if sigma_only:
        return jax.nn.softplus(_dense(params["static_sigma"], h, dt))

    # MXU-packing: narrow head matmuls sharing an input are fused into
    # one matmul and split afterwards — but ONLY in 128-lane-aligned
    # groups (a (W, W+1) pack pads to two lane tiles and is slower):
    #   [dir-branch pre | transient-0 pre]   : (W, W//2 + W//2) = (W, W)
    #   [static_rgb ⊕ transient heads]       : block-diag (2·W//2, out)
    static_sigma = jax.nn.softplus(_dense(params["static_sigma"], h, dt))
    xyz_final = _dense(params["xyz_final"], h, dt)

    wd = params["dir"]["w"]
    per_ray = jnp.dot(dir_emb.astype(dt), wd[W:W + cfg.in_dir].astype(dt),
                      preferred_element_type=jnp.float32)
    if cfg.encode_appearance:
        per_ray = per_ray + jnp.dot(a_emb.astype(dt), wd[W + cfg.in_dir:].astype(dt),
                                    preferred_element_type=jnp.float32)
    per_ray = per_ray + params["dir"]["b"]

    if not output_transient:
        d = jnp.dot(xyz_final.astype(dt), wd[:W].astype(dt),
                    preferred_element_type=jnp.float32)
        d = jax.nn.relu(d + per_ray[:, None, :])
        rgb = _dense(params["static_rgb"], d.astype(dt), dt)
        if cfg.out_ch == 3:
            rgb = jax.nn.sigmoid(rgb)
        return jnp.concatenate([rgb, static_sigma], -1)

    wt = params["trans_0"]["w"]
    t_per_ray = jnp.dot(t_emb.astype(dt), wt[W:].astype(dt),
                        preferred_element_type=jnp.float32) + params["trans_0"]["b"]
    half = W // 2
    w_dt = jnp.concatenate([wd[:W], wt[:W]], -1)          # (W, 2*half)
    dt_pre = jnp.dot(xyz_final.astype(dt), w_dt.astype(dt),
                     preferred_element_type=jnp.float32)
    d = jax.nn.relu(dt_pre[..., :half] + per_ray[:, None, :]).astype(dt)
    t = jax.nn.relu(dt_pre[..., half:] + t_per_ray[:, None, :]).astype(dt)
    for i in (1, 2, 3):
        t = jax.nn.relu(_dense(params[f"trans_{i}"], t, dt)).astype(dt)

    # block-diagonal packed heads over [d | t]
    oc = cfg.out_ch
    w_heads = jnp.block([
        [params["static_rgb"]["w"],
         jnp.zeros((half, oc + 2), params["static_rgb"]["w"].dtype)],
        [jnp.zeros((half, oc), params["trans_rgb"]["w"].dtype),
         jnp.concatenate([params["trans_rgb"]["w"],
                          params["trans_sigma"]["w"],
                          params["trans_beta"]["w"]], -1)],
    ])
    heads = jnp.dot(jnp.concatenate([d, t], -1), w_heads.astype(dt),
                    preferred_element_type=jnp.float32)
    rgb = heads[..., :oc] + params["static_rgb"]["b"]
    t_rgb = heads[..., oc:2 * oc] + params["trans_rgb"]["b"]
    if cfg.out_ch == 3:
        rgb = jax.nn.sigmoid(rgb)
        t_rgb = jax.nn.sigmoid(t_rgb)
    t_sigma = jax.nn.softplus(heads[..., 2 * oc:2 * oc + 1]
                              + params["trans_sigma"]["b"])
    t_beta = jax.nn.softplus(heads[..., 2 * oc + 1:] + params["trans_beta"]["b"])
    return jnp.concatenate([rgb, static_sigma, t_rgb, t_sigma, t_beta], -1)


def init_sigma_mlp(key, cfg: NeRFWConfig) -> Dict:
    """Sigma-only MLP params (proposal sampler): xyz trunk + static_sigma
    head, no color/dir/transient branches. Applied with
    nerfw_apply_rays(..., sigma_only=True)."""
    keys = jax.random.split(key, cfg.D + 1)
    p: Dict = {}
    for i in range(cfg.D):
        fan_in = cfg.in_xyz if i == 0 else (
            cfg.W + cfg.in_xyz if i in cfg.skips else cfg.W)
        p[f"xyz_{i}"] = _torch_linear_init(keys[i], fan_in, cfg.W)
    p["static_sigma"] = _torch_linear_init(keys[-1], cfg.W, 1)
    return p


# ---------------------------------------------------------------------------
# histogram embeddings
# ---------------------------------------------------------------------------

def init_embeddings(key, n_vocab: int, n_a: int = 5, n_tau: int = 2) -> Dict:
    """Appearance/transient embedding tables, N(0,1) init like
    torch.nn.Embedding."""
    ka, kt = jax.random.split(key)
    return {
        "a": jax.random.normal(ka, (n_vocab, n_a), jnp.float32),
        "t": jax.random.normal(kt, (n_vocab, n_tau), jnp.float32),
    }


def lookup_hist_embedding(table: jnp.ndarray, hist: jnp.ndarray) -> jnp.ndarray:
    """hist (N, hist_bin) int → (N, hist_bin*dim): rows gathered per bin
    and flattened (nerfw.py:69-81)."""
    emb = table[hist]                       # (N, hist_bin, dim)
    return emb.reshape(hist.shape[0], -1)
