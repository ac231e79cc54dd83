"""Fused Pallas TPU kernels for the NeRF-H hot loop.

The profile (see bench.py history) shows XLA's render path is
HBM-bound: every MLP layer round-trips (points × width) activations
through HBM, and the positional encoding materializes (points × 63)
inputs. These kernels fuse positional encoding → trunk MLP → heads for
one point tile entirely in VMEM: per point, HBM traffic drops to the
12-byte input position (+ two optional per-point conditioning partials)
and the raw head outputs, instead of ~20 layer-activation round-trips.

Used on the no-gradient paths (test-time rendering: eval, stage-2/3
pre-renders, the benchmark). Training and stage-3's differentiable
render keep the XLA path (autodiff).

Design notes:
  - point-major: callers flatten rays×samples to a point axis and
    pre-expand the (cheap, XLA-fused) per-ray partials; the kernel is a
    clean 2-D pipeline with no in-kernel reshapes or broadcasts, which
    Mosaic compiles quickly and tiles well;
  - matmuls run in bfloat16 with float32 accumulation;
  - the in-kernel PE emits [xyz, sin(f⊗xyz), cos(f⊗xyz)] grouped
    frequency-major, so the reference layer-0 rows (interleaved sin/cos
    per frequency) are permuted once at pack time;
  - per-ray dense work (viewdir/appearance/transient embeddings) is
    pre-reduced to (N_rays, W//2) partials outside the kernel — computed
    once per ray, not per sample (see models/nerfw.nerfw_apply_rays).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfnet_tpu.models.embedder import Embedder
from dfnet_tpu.models.nerfw import NeRFWConfig

POINT_TILE = 2048       # fine-kernel points per program (VMEM-bound)
COARSE_TILE = 4096      # coarse kernel is trunk-only → larger tiles fit


def _pe_matrix(emb: Embedder) -> np.ndarray:
    """(3, 3*F) matrix M with (pts @ M)[:, j] = pts[:, j % 3] * f[j // 3]."""
    F = emb.num_freqs
    M = np.zeros((3, 3 * F), np.float32)
    for k, f in enumerate(emb.freq_bands):
        for c in range(3):
            M[c, 3 * k + c] = f
    return M


def _layer0_row_perm(F: int) -> np.ndarray:
    """Map reference PE layout [x, sinf0, cosf0, sinf1, cosf1, ...] row
    indices to kernel layout [x, sinf0..sinfF, cosf0..cosfF]."""
    rows = list(range(3))
    for k in range(F):
        rows.extend(range(3 + 6 * k, 3 + 6 * k + 3))
    for k in range(F):
        rows.extend(range(3 + 6 * k + 3, 3 + 6 * k + 6))
    return np.array(rows)


def pack_fused_params(params: Dict, cfg: NeRFWConfig, emb_xyz: Embedder,
                      fine: bool) -> Dict:
    """Repack a NeRFW param dict for the fused kernel (bf16 weights,
    permuted layer-0 rows, fp32 biases)."""
    perm = _layer0_row_perm(emb_xyz.num_freqs)
    bf = jnp.bfloat16

    def w(p):
        return jnp.asarray(p["w"], bf)

    def b(p):
        return jnp.asarray(p["b"], jnp.float32)

    perm_j = jnp.asarray(perm)
    out = {
        "pe": jnp.asarray(_pe_matrix(emb_xyz)),
        "w0": jnp.asarray(params["xyz_0"]["w"], bf)[perm_j],
        "b0": b(params["xyz_0"]),
    }
    skip = cfg.skips[0]
    for i in range(1, cfg.D):
        if i == skip:
            wi = jnp.asarray(params[f"xyz_{i}"]["w"], bf)
            out[f"w{i}a"] = wi[:cfg.in_xyz][perm_j]                 # xyz part
            out[f"w{i}b"] = wi[cfg.in_xyz:]                         # h part
        else:
            out[f"w{i}"] = w(params[f"xyz_{i}"])
        out[f"b{i}"] = b(params[f"xyz_{i}"])
    out["w_sigma"] = w(params["static_sigma"])
    out["b_sigma"] = b(params["static_sigma"])
    out["w_final"] = w(params["xyz_final"])
    out["b_final"] = b(params["xyz_final"])
    W = cfg.W
    out["w_dir_h"] = jnp.asarray(params["dir"]["w"], bf)[:W]
    out["w_rgb"] = w(params["static_rgb"])
    out["b_rgb"] = b(params["static_rgb"])
    if fine:
        out["w_t0_h"] = jnp.asarray(params["trans_0"]["w"], bf)[:W]
        for i in (1, 2, 3):
            out[f"w_t{i}"] = w(params[f"trans_{i}"])
            out[f"b_t{i}"] = b(params[f"trans_{i}"])
        out["w_tsigma"] = w(params["trans_sigma"])
        out["b_tsigma"] = b(params["trans_sigma"])
        out["w_trgb"] = w(params["trans_rgb"])
        out["b_trgb"] = b(params["trans_rgb"])
        out["w_tbeta"] = w(params["trans_beta"])
        out["b_tbeta"] = b(params["trans_beta"])
    return out


def per_ray_partials(params: Dict, cfg: NeRFWConfig, dir_emb, a_emb=None,
                     t_emb=None):
    """Pre-reduce per-ray inputs: dir_part = [d, a] @ W_dir[rows] + b_dir,
    t_part = t @ W_t0[rows] + b_t0 — both (N, W//2)."""
    W = cfg.W
    wd = params["dir"]["w"]
    dir_part = dir_emb @ wd[W:W + cfg.in_dir] + params["dir"]["b"]
    if cfg.encode_appearance and a_emb is not None:
        dir_part = dir_part + a_emb @ wd[W + cfg.in_dir:]
    t_part = None
    if cfg.encode_transient and t_emb is not None:
        wt = params["trans_0"]["w"]
        t_part = t_emb @ wt[W:] + params["trans_0"]["b"]
    return dir_part, t_part


def _dot(a, w):
    return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _trunk(p, x, D: int, skip: int):
    """x: (T, 63) bf16 → h (T, W) bf16, all in VMEM, 2-D matmuls only.
    (Mosaic requires 32-bit matmul accumulation; activations are cast
    back to bf16 between layers.)"""
    h = jax.nn.relu(_dot(x, p["w0"]) + p["b0"]).astype(jnp.bfloat16)
    for i in range(1, D):
        if i == skip:
            y = _dot(x, p[f"w{i}a"]) + _dot(h, p[f"w{i}b"]) + p[f"b{i}"]
        else:
            y = _dot(h, p[f"w{i}"]) + p[f"b{i}"]
        h = jax.nn.relu(y).astype(jnp.bfloat16)
    return h


def _embed(p, pts):
    """(T,3) → PE features (T, 63) bf16."""
    xs = _dot(pts, p["pe"])                                   # (T, 30)
    x = jnp.concatenate([pts, jnp.sin(xs), jnp.cos(xs)], -1)  # (T, 63)
    return x.astype(jnp.bfloat16)


def _fine_kernel(D: int, skip: int, pts_ref, dirp_ref, tp_ref, *rest):
    p_names = rest[-1]
    out_ref = rest[-2]
    p = {k: r[...] for k, r in zip(p_names, rest[:-2])}

    x = _embed(p, pts_ref[...])
    h = _trunk(p, x, D, skip)
    sigma = jax.nn.softplus(_dot(h, p["w_sigma"]) + p["b_sigma"])
    hf = (_dot(h, p["w_final"]) + p["b_final"]).astype(jnp.bfloat16)

    db = jax.nn.relu(_dot(hf, p["w_dir_h"]) + dirp_ref[...])
    rgb = jax.nn.sigmoid(_dot(db.astype(jnp.bfloat16), p["w_rgb"]) + p["b_rgb"])

    t = jax.nn.relu(_dot(hf, p["w_t0_h"]) + tp_ref[...]).astype(jnp.bfloat16)
    for i in (1, 2, 3):
        t = jax.nn.relu(_dot(t, p[f"w_t{i}"]) + p[f"b_t{i}"]).astype(jnp.bfloat16)
    t_sigma = jax.nn.softplus(_dot(t, p["w_tsigma"]) + p["b_tsigma"])
    t_rgb = jax.nn.sigmoid(_dot(t, p["w_trgb"]) + p["b_trgb"])
    t_beta = jax.nn.softplus(_dot(t, p["w_tbeta"]) + p["b_tbeta"])

    out_ref[...] = jnp.concatenate(
        [rgb, sigma, t_rgb, t_sigma, t_beta], -1).astype(jnp.float32)


def _coarse_kernel(D: int, skip: int, pts_ref, *rest):
    p_names = rest[-1]
    out_ref = rest[-2]
    p = {k: r[...] for k, r in zip(p_names, rest[:-2])}
    x = _embed(p, pts_ref[...])
    h = _trunk(p, x, D, skip)
    out_ref[...] = jax.nn.softplus(_dot(h, p["w_sigma"]) + p["b_sigma"])


def _pt_spec(feat: int, tile: int = POINT_TILE):
    return pl.BlockSpec((tile, feat), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _param_specs(packed: Dict):
    names = sorted(packed.keys())
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in names]
    return names, specs


def fused_fine_raw(packed: Dict, pts, dir_part, t_part,
                   D: int = 8, skip: int = 4, interpret=None):
    """pts (P,3) bf16/f32, dir_part/t_part (P, W//2) f32 (pre-expanded to
    points) → raw (P, 9). P % POINT_TILE == 0. interpret=None →
    auto-interpret on the CPU backend (Mosaic is TPU-only)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_fine_raw(packed, pts, dir_part, t_part, D, skip, interpret)


@functools.partial(jax.jit, static_argnames=("D", "skip", "interpret"))
def _fused_fine_raw(packed: Dict, pts, dir_part, t_part,
                    D: int = 8, skip: int = 4, interpret: bool = False):
    n = pts.shape[0]
    names, pspecs = _param_specs(packed)
    kernel = functools.partial(_fine_kernel, D, skip)
    return pl.pallas_call(
        lambda *refs: kernel(*refs[:3], *refs[3:3 + len(names)], refs[-1], names),
        grid=(n // POINT_TILE,),
        in_specs=[_pt_spec(3), _pt_spec(dir_part.shape[-1]),
                  _pt_spec(t_part.shape[-1])] + pspecs,
        out_specs=_pt_spec(9),
        out_shape=jax.ShapeDtypeStruct((n, 9), jnp.float32),
        interpret=interpret,
    )(pts, dir_part, t_part, *[packed[k] for k in names])


def fused_coarse_sigma(packed: Dict, pts,
                       D: int = 8, skip: int = 4, interpret=None):
    """pts (P,3) → sigma (P, 1). interpret=None → auto-interpret on CPU."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_coarse_sigma(packed, pts, D, skip, interpret)


@functools.partial(jax.jit, static_argnames=("D", "skip", "interpret"))
def _fused_coarse_sigma(packed: Dict, pts,
                        D: int = 8, skip: int = 4, interpret: bool = False):
    n = pts.shape[0]
    names, pspecs = _param_specs(packed)
    kernel = functools.partial(_coarse_kernel, D, skip)
    tile = COARSE_TILE if n % COARSE_TILE == 0 else POINT_TILE
    return pl.pallas_call(
        lambda *refs: kernel(refs[0], *refs[1:1 + len(names)], refs[-1], names),
        grid=(n // tile,),
        in_specs=[_pt_spec(3, tile)] + pspecs,
        out_specs=_pt_spec(1, tile),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret,
    )(pts, *[packed[k] for k in names])
