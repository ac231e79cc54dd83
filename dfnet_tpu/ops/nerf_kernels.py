"""Fused Pallas TPU kernels for NeRF-H rendering AND training (transposed).

Layout: FEATURES IN ROWS (sublanes), POINTS IN LANES. Every tensor a
kernel touches is a clean (128, T) tile; a layer is
dot(W_T (128,128), h (128,T)) with a per-row bias column. Measured on
v5e: 0.36 ms marginal per such layer at T-total = 2M points
(~150 TFLOPS), vs ~0.79 ms for the same matmul as a standalone XLA op.

Why transposed (learned the hard way — see QUALITY.md kernel log):
  - the point-major kernel needed a (P,128) f32 positional-encoding
    input materialized by XLA (512 B/point HBM round-trip) because
    in-kernel lane-broadcasts of per-point scalars are not expressible;
    transposed, per-point z is a (1,T) ROW that broadcasts over feature
    rows natively, so rays (o,d) + z go in and positions, PE arguments,
    and features are all built in VMEM: input traffic is ~12 B/point.
  - the raw MLP output wants to be consumed channel-wise (sigma, rgb,
    beta feed different compositing terms). A point-major (P, 9-ish)
    output puts channels in the MINOR dim, and every XLA consumer then
    pays a padded-lane relayout (measured +25 ms per 2M-point chunk!).
    Transposed, the output is already channel-major (16, P): channel c
    reshapes to a clean (N, S) lanes-along-samples array for free.
  - per-ray rows (pose, conditioning partials) expand to per-point
    columns by a one-hot matmul against a constant (128, T) expansion
    matrix — no HBM repeat, no gathers.

Other rules (unchanged from the point-major experiments):
  - no jnp.sin in-kernel (Mosaic's sin is ~25x too slow): degree-9 odd
    polynomial after round-to-nearest period reduction, error ~3e-7;
  - no other transcendentals in-kernel: outputs are PRE-activation,
    XLA applies softplus/sigmoid on tiny per-channel arrays;
  - bf16 operands / f32 accumulation for every matmul; positions, PE
    arguments and the sine stay f32 (high PE frequencies need ~1e-4
    argument precision, far beyond bf16);
  - xyz_final is linear and feeds only the dir/transient branch, so it
    is folded into one packed matrix at pack time (saves a pass);
  - the W//2-wide transient sub-MLP rides the same (128, T) stream as
    the dir branch via [[I,0],[0,W_t]] block weights (identity carry is
    free on the MXU).

Pass count (fine): trunk 9 (8 layers + skip split) + folded dir/trans 1
+ transient 3 + heads 1 + sigma 1 + expansions ~2 = ~17 per tile.

Forward kernels here power both inference (render/fast.py) and the
fused training path: render/fused_train.py wraps them in a custom VJP
whose backward recomputes activations in VMEM (raw_bwd_t below) with
f32 weight-grad accumulation across grid steps. The plain XLA path in
models/nerfw.py remains as the reference/fallback.
Functional parity: /root/reference/script/models/
nerfw.py:220-354 (MLP heads), :97-130 (positional encoding);
/root/reference/script/models/rendering.py:245-337 (pipeline).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfnet_tpu.models.embedder import Embedder
from dfnet_tpu.models.nerfw import NeRFWConfig

LANES = 128
_TWO_PI = 2.0 * np.pi

_SIN_COEFFS = None


def _sin_coeffs() -> np.ndarray:
    """Degree-9 odd fit of sin(2*pi*r), r in [-0.5, 0.5] (max err ~3e-7)."""
    global _SIN_COEFFS
    if _SIN_COEFFS is None:
        r = 0.5 * np.cos(np.linspace(0.0, np.pi, 4001))
        A = np.stack([r, r**3, r**5, r**7, r**9], -1)
        c, *_ = np.linalg.lstsq(A, np.sin(_TWO_PI * r), rcond=None)
        _SIN_COEFFS = c.astype(np.float32)
    return _SIN_COEFFS


def _fast_sin(x):
    """sin(x) via period reduction + odd degree-9 polynomial (VPU-only)."""
    c1, c3, c5, c7, c9 = [float(v) for v in _sin_coeffs()]
    t = x * np.float32(1.0 / _TWO_PI)
    r = t - jnp.round(t)
    r2 = r * r
    return r * (c1 + r2 * (c3 + r2 * (c5 + r2 * (c7 + r2 * c9))))


# ---------------------------------------------------------------------------
# packing (weights transposed: out-features in rows)
# ---------------------------------------------------------------------------

def pe_rows_for(F: int) -> int:
    """Feature-row count for F frequencies, rounded to a bf16 sublane
    tile (16). Small-F MLPs (the proposal) pay proportionally less
    PE/sine work."""
    n = 6 * F + 3
    return max(64, -(-n // 64) * 64)


def _lane_perm(F: int) -> np.ndarray:
    """kernel feature-row -> reference PE row. Kernel xs rows:
    [sin args f0..fF (3 each) | cos args | raw xyz | zeros]; reference
    rows: [xyz(3), sin f0(3), cos f0(3), sin f1(3), ...]."""
    rows = pe_rows_for(F)
    if 6 * F + 3 > LANES:
        raise ValueError(f"multires {F} needs {6*F+3} feature rows > {LANES}")
    perm = np.full((rows,), -1, np.int64)
    for k in range(F):
        for c in range(3):
            perm[3 * k + c] = 3 + 6 * k + c
            perm[3 * F + 3 * k + c] = 3 + 6 * k + 3 + c
    for c in range(3):
        perm[6 * F + c] = c
    return perm


def pe_matrices(emb: Embedder) -> Tuple[np.ndarray, np.ndarray]:
    """(M_T, phase_col): xs_t = M_T @ pts_t + phase_col.
    M_T (rows, 3) f32, phase_col (rows, 1) f32. Raw-xyz rows get an
    identity entry; sin is masked off for rows >= 6F in-kernel."""
    F = emb.num_freqs
    rows = pe_rows_for(F)
    bands = emb.freq_bands
    M = np.zeros((rows, 3), np.float32)
    phase = np.zeros((rows, 1), np.float32)
    for k in range(F):
        for c in range(3):
            M[3 * k + c, c] = bands[k]
            M[3 * F + 3 * k + c, c] = bands[k]
            phase[3 * F + 3 * k + c, 0] = np.pi / 2.0
    for c in range(3):
        M[6 * F + c, c] = 1.0
    return M, phase


@dataclass(frozen=True)
class KernelSpec:
    D: int
    skip: int
    F: int
    fine: bool
    # PE-argument map as VPU broadcast-MACs (cheaper when the MLP is too
    # small to hide an f32 matmul behind, i.e. the sigma-only kernels)
    pe_mac: bool = False


def _wT(params, name, bf=jnp.bfloat16):
    return jnp.asarray(params[name]["w"], bf).T


def _b_col(params, name):
    return jnp.asarray(params[name]["b"], jnp.float32)[:, None]


def _expand_cols(wT: jnp.ndarray, perm: np.ndarray, scale=None) -> jnp.ndarray:
    """(out, in_xyz) transposed weight -> (out, rows): columns placed
    per `perm`, dead feature rows' columns zero."""
    out = jnp.zeros((wT.shape[0], perm.shape[0]), wT.dtype)
    live = perm >= 0
    cols = wT[:, perm[live]]
    if scale is not None:
        cols = cols * scale[live][None, :]
    return out.at[:, np.nonzero(live)[0]].set(cols)


def pack_trunk_t(params: Dict, cfg: NeRFWConfig, emb: Embedder,
                 freq_window: np.ndarray | None = None) -> Dict:
    """Transposed trunk packing (shared by coarse and fine). freq_window:
    optional (F,) multiplier folded into the PE columns (Nerfie
    annealing frozen at a chosen epoch)."""
    F = emb.num_freqs
    perm = _lane_perm(F)
    scale = None
    if freq_window is not None:
        scale = np.ones((perm.shape[0],), np.float32)
        for k in range(F):
            for c in range(3):
                scale[3 * k + c] = freq_window[k]
                scale[3 * F + 3 * k + c] = freq_window[k]
        scale = jnp.asarray(scale)
    skip = cfg.skips[0] if cfg.skips and cfg.skips[0] < cfg.D else -1
    M, phase = pe_matrices(emb)
    M_hi = M.astype(np.float32).astype(jnp.bfloat16)
    M_lo = (M - np.asarray(M_hi, np.float32)).astype(jnp.bfloat16)
    pe_m16 = jnp.concatenate(
        [M_hi, M_hi, M_lo, jnp.zeros((M.shape[0], 7), jnp.bfloat16)], 1)
    p = {
        "pe_m": jnp.asarray(M),                       # (rows, 3) f32
        "pe_m16": pe_m16,                  # (rows, 16) bf16 [Mhi Mhi Mlo 0]
        "pe_phase": jnp.asarray(phase),               # (rows, 1) f32
        "w0": _expand_cols(_wT(params, "xyz_0"), perm, scale),
        "b_trunk": jnp.stack([_b_col(params, f"xyz_{i}") for i in range(cfg.D)]),
    }
    if skip >= 0:
        p["wskip_x"] = _expand_cols(
            jnp.asarray(params[f"xyz_{skip}"]["w"][:cfg.in_xyz],
                        jnp.bfloat16).T, perm, scale)
        p["wskip_h"] = jnp.asarray(params[f"xyz_{skip}"]["w"][cfg.in_xyz:],
                                   jnp.bfloat16).T
    mids = [_wT(params, f"xyz_{i}") for i in range(1, cfg.D) if i != skip]
    if mids:
        p["w_mid"] = jnp.stack(mids)
    return p


def pack_coarse_t(params: Dict, cfg: NeRFWConfig, emb: Embedder,
                  freq_window=None) -> Dict:
    p = pack_trunk_t(params, cfg, emb, freq_window)
    # sigma row 0 of an (8, W)-padded head (f32 min sublane block is 8)
    w = jnp.zeros((8, cfg.W), jnp.bfloat16)
    p["w_sigma8"] = w.at[0].set(jnp.asarray(params["static_sigma"]["w"][:, 0],
                                            jnp.bfloat16))
    b = jnp.zeros((8, 1), jnp.float32)
    p["b_sigma8"] = b.at[0, 0].set(
        jnp.asarray(params["static_sigma"]["b"], jnp.float32)[0])
    return p


# Fine kernel output rows (PRE-activation), matching composite raw order:
# rgb(0:3) sigma(3) trgb(4:7) tsigma(7) tbeta(8); rows 9:16 zero.
FINE_OUT = 9
OUT_ROWS = 16


def pack_fine_t(params: Dict, cfg: NeRFWConfig, emb: Embedder,
                freq_window=None) -> Dict:
    p = pack_trunk_t(params, cfg, emb, freq_window)
    W = cfg.W
    half = W // 2
    f32 = jnp.float32
    if cfg.out_ch != 3:
        raise ValueError("fused fine kernel supports out_ch=3 only")
    w_final = jnp.asarray(params["xyz_final"]["w"], f32)
    b_final = jnp.asarray(params["xyz_final"]["b"], f32)
    wd_h = jnp.asarray(params["dir"]["w"], f32)[:W]
    wt_h = jnp.asarray(params["trans_0"]["w"], f32)[:W]
    w_dt = jnp.concatenate([wd_h, wt_h], -1)              # (W, 2*half)
    # dt_pre = (W_final @ [wd|wt])^T @ h + (b_final @ [wd|wt])^T
    p["w_dt"] = (w_final @ w_dt).T.astype(jnp.bfloat16)   # (LANES, W)
    p["b_dt_fold"] = (b_final @ w_dt)[:, None]            # (LANES, 1) f32
    eye = jnp.eye(half, dtype=f32)
    w_tr, b_tr = [], []
    for i in (1, 2, 3):
        wt = jnp.asarray(params[f"trans_{i}"]["w"], f32)
        w_tr.append(jnp.block([[eye, jnp.zeros((half, half), f32)],
                               [jnp.zeros((half, half), f32), wt]]
                              ).T.astype(jnp.bfloat16))
        b_tr.append(jnp.concatenate(
            [jnp.zeros((half,), f32),
             jnp.asarray(params[f"trans_{i}"]["b"], f32)])[:, None])
    p["w_trans"] = jnp.stack(w_tr)                        # (3, LANES, LANES)
    p["b_trans"] = jnp.stack(b_tr)                        # (3, LANES, 1)
    # heads^T: rows = output channels, cols = [d | t] features
    w_heads = jnp.zeros((LANES, W), f32)
    w_heads = w_heads.at[0:3, :half].set(
        jnp.asarray(params["static_rgb"]["w"], f32).T)
    w_heads = w_heads.at[4:7, half:].set(
        jnp.asarray(params["trans_rgb"]["w"], f32).T)
    w_heads = w_heads.at[7:8, half:].set(
        jnp.asarray(params["trans_sigma"]["w"], f32).T)
    w_heads = w_heads.at[8:9, half:].set(
        jnp.asarray(params["trans_beta"]["w"], f32).T)
    p["w_heads"] = w_heads.astype(jnp.bfloat16)
    w_sig = jnp.zeros((LANES, W), jnp.bfloat16)
    p["w_sigma_pad"] = w_sig.at[3].set(
        jnp.asarray(params["static_sigma"]["w"][:, 0], jnp.bfloat16))
    bias = jnp.zeros((LANES, 1), f32)
    bias = bias.at[0:3, 0].set(jnp.asarray(params["static_rgb"]["b"], f32))
    bias = bias.at[3, 0].set(jnp.asarray(params["static_sigma"]["b"], f32)[0])
    bias = bias.at[4:7, 0].set(jnp.asarray(params["trans_rgb"]["b"], f32))
    bias = bias.at[7, 0].set(jnp.asarray(params["trans_sigma"]["b"], f32)[0])
    bias = bias.at[8, 0].set(jnp.asarray(params["trans_beta"]["b"], f32)[0])
    p["b_heads"] = bias
    return p


def pack_static_t(params: Dict, cfg: NeRFWConfig, emb: Embedder,
                  freq_window=None) -> Dict:
    """Static (no-transient) full pack for the coarse TRAIN pass: trunk +
    dir branch + [rgb, sigma] heads riding the fine-kernel structure
    (spec.fine=False skips the transient chain; the dt stream's upper
    half is dead). Reference semantics: nerfw.py:220-354 with
    output_transient=False."""
    p = pack_trunk_t(params, cfg, emb, freq_window)
    W = cfg.W
    half = W // 2
    f32 = jnp.float32
    if cfg.out_ch != 3:
        raise ValueError("fused static kernel supports out_ch=3 only")
    w_final = jnp.asarray(params["xyz_final"]["w"], f32)
    b_final = jnp.asarray(params["xyz_final"]["b"], f32)
    wd_h = jnp.asarray(params["dir"]["w"], f32)[:W]        # (W, half)
    w_dt = jnp.concatenate([wd_h, jnp.zeros((W, W - half), f32)], -1)
    p["w_dt"] = (w_final @ w_dt).T.astype(jnp.bfloat16)    # (LANES, W)
    p["b_dt_fold"] = (b_final @ w_dt)[:, None]             # (LANES, 1) f32
    w_heads = jnp.zeros((LANES, W), f32)
    w_heads = w_heads.at[0:3, :half].set(
        jnp.asarray(params["static_rgb"]["w"], f32).T)
    p["w_heads"] = w_heads.astype(jnp.bfloat16)
    w_sig = jnp.zeros((LANES, W), jnp.bfloat16)
    p["w_sigma_pad"] = w_sig.at[3].set(
        jnp.asarray(params["static_sigma"]["w"][:, 0], jnp.bfloat16))
    bias = jnp.zeros((LANES, 1), f32)
    bias = bias.at[0:3, 0].set(jnp.asarray(params["static_rgb"]["b"], f32))
    bias = bias.at[3, 0].set(jnp.asarray(params["static_sigma"]["b"], f32)[0])
    p["b_heads"] = bias
    return p


def per_ray_row_static(params: Dict, cfg: NeRFWConfig, dir_emb, a_emb=None):
    """(N, LANES) f32 [dp | 0]: per-ray half of the dir matmul for the
    static pack (bias folded); the transient half is dead."""
    W = cfg.W
    wd = params["dir"]["w"]
    dp = dir_emb @ wd[W:W + cfg.in_dir] + params["dir"]["b"]
    if cfg.encode_appearance and a_emb is not None:
        dp = dp + a_emb @ wd[W + cfg.in_dir:]
    n = dp.shape[0]
    return jnp.concatenate(
        [dp, jnp.zeros((n, W - dp.shape[-1]), dp.dtype)],
        -1).astype(jnp.float32)


def per_ray_row(params: Dict, cfg: NeRFWConfig, dir_emb, a_emb, t_emb):
    """(N, LANES) f32 [dp | tp]: per-ray halves of the dir and
    transient-0 matmuls, biases folded (the hf half is the kernel's
    folded w_dt)."""
    W = cfg.W
    wd = params["dir"]["w"]
    dp = dir_emb @ wd[W:W + cfg.in_dir] + params["dir"]["b"]
    if cfg.encode_appearance and a_emb is not None:
        dp = dp + a_emb @ wd[W + cfg.in_dir:]
    wt = params["trans_0"]["w"]
    tp = t_emb @ wt[W:] + params["trans_0"]["b"]
    # a/t embeddings may be (1, ·) (uniform hist, gather-once) while the
    # dir half is per-ray — broadcast before the concat
    dp = jnp.broadcast_to(dp, (max(dp.shape[0], tp.shape[0]), dp.shape[1]))
    tp = jnp.broadcast_to(tp, (dp.shape[0], tp.shape[1]))
    return jnp.concatenate([dp, tp], -1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# ray/tile plumbing (XLA side)
# ---------------------------------------------------------------------------

def tile_geometry(S: int, target: int = 2048) -> Tuple[int, int]:
    """(rays_per_tile R, points_per_tile T=R*S), T%128==0, T near target.
    R is capped at LANES (the one-hot expansion matrix has LANES rows)."""
    R = max(1, min(LANES, target // S))
    while R > 1 and (R * S) % 128 != 0:
        R -= 1
    T = R * S
    if T % 128 != 0:
        raise ValueError(f"cannot tile S={S} into 128-aligned point tiles")
    return R, T


def _expand_matrix_t(R: int, S: int) -> np.ndarray:
    """(LANES, R*S) one-hot: row r lights the lanes of local ray r."""
    E = np.zeros((LANES, R * S), np.float32)
    E[np.arange(R * S) // S, np.arange(R * S)] = 1.0
    return E


def od_tiles_of(rays_o, rays_d, R: int) -> jnp.ndarray:
    """(N,3)+(N,3) -> (G, 16, LANES) bf16 hi/lo split: rows 0:3 = o^T,
    rows 3:6 = d^T (bf16 high parts), rows 8:14 the f32 residuals in
    bf16. The in-kernel ray->point expansion is then ONE bf16 matmul
    with f32 accumulation instead of an f32xf32 matmul — same ~1e-5
    relative o/d precision (hi+lo), 4x the MXU rate, and it avoids the
    f32-matmul Mosaic path whose compiles take minutes instead of
    seconds (measured: 146 s -> 3.6 s on the placement sweep)."""
    n = rays_o.shape[0]
    G = n // R
    od = jnp.concatenate([rays_o, rays_d], -1).astype(jnp.float32)  # (N, 6)
    od = od.reshape(G, R, 6)
    od = jnp.transpose(od, (0, 2, 1))                                # (G, 6, R)
    hi = od.astype(jnp.bfloat16)
    lo = (od - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    tiles = jnp.zeros((G, 16, LANES), jnp.bfloat16)
    tiles = tiles.at[:, 0:6, :R].set(hi)
    return tiles.at[:, 8:14, :R].set(lo)


def dpt_tiles_of(dpt: jnp.ndarray, R: int) -> jnp.ndarray:
    """(N, Wd) per-ray rows -> (G, max(Wd,LANES), LANES) bf16 transposed
    tiles: [g, :Wd, r] is ray g*R+r's row. Wd beyond LANES (wide MLPs,
    W=256) just adds sublane rows — the in-kernel expansion matmul
    dpt_tile @ exp is row-count agnostic."""
    n, wd = dpt.shape
    G = n // R
    rows = max(LANES, wd)
    t = jnp.transpose(dpt.reshape(G, R, wd), (0, 2, 1)).astype(jnp.bfloat16)
    tiles = jnp.zeros((G, rows, LANES), jnp.bfloat16)
    return tiles.at[:, :wd, :R].set(t)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _dot(w, h):
    if jax.default_backend() == "cpu":
        # interpret mode (tests): the eager CPU runtime lacks bf16 dot
        # kernels for some shapes — upcast (trace-time constant branch)
        w, h = w.astype(jnp.float32), h.astype(jnp.float32)
    return jax.lax.dot_general(w, h, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pts_to_x0(p, od, z_row, exp_bf, spec: "KernelSpec"):
    """(16,LANES) hi/lo od tile + (1,T) z row -> (LANES,T) bf16 PE
    features.

    Both matmuls here carry values that need ~1e-4 argument precision
    (high PE frequencies), beyond bf16 — but instead of f32xf32
    matmuls (4x the MXU cost AND a Mosaic path whose compiles take
    minutes) they run as single bf16 matmuls over hi/lo-split operands
    with f32 accumulation: x = hi + lo reconstructs the f32 input to
    ~2^-17 relative. The PE-argument map xs = M @ pts is K=3; in the
    tiny sigma-only kernels even that is better as three
    (LANES,1)x(1,T) broadcast MACs on the f32 pts (spec.pe_mac)."""
    od16 = _dot(od, exp_bf)                             # (16, T) f32
    od6 = od16[0:6] + od16[8:14]                        # hi + lo
    pts_t = od6[0:3] + od6[3:6] * z_row                 # (3, T) f32
    rows = p["pe_m"].shape[0]
    if spec.pe_mac:
        # Small-F specs (the proposal, F=4: 27 live rows of 64) compute
        # the MACs + sine polynomial only on the live sublane block and
        # zero-pad for the w0 matmul (dead w0 columns are zero anyway) —
        # the jnp.where below evaluates _fast_sin on every row it sees,
        # which at F=4 would be ~60% wasted VPU work.
        live = min(rows, -(-(6 * spec.F + 3) // 16) * 16)  # bf16 sublanes
        m = p["pe_m"][:live]
        xs = (m[:, 0:1] * pts_t[0:1] + m[:, 1:2] * pts_t[1:2]
              + m[:, 2:3] * pts_t[2:3] + p["pe_phase"][:live])  # (live, T)
    else:
        live = rows
        # xs = M @ pts via one bf16 matmul over stacked hi/lo operands:
        # (Mhi+Mlo)(hi+lo) ~= Mhi@hi + Mhi@lo + Mlo@hi (the dropped
        # Mlo@lo term is ~2^-34 relative). pe_m16 columns: [Mhi, Mhi,
        # Mlo, 0-pad]; point rows: [hi, lo, hi, 0-pad].
        hi = pts_t.astype(jnp.bfloat16)
        lo = (pts_t - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        pts16 = jnp.concatenate(
            [hi, lo, hi, jnp.zeros((7,) + pts_t.shape[1:], jnp.bfloat16)], 0)
        xs = _dot(p["pe_m16"], pts16) + p["pe_phase"]
    row = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    x0 = jnp.where(row < 6 * spec.F, _fast_sin(xs), xs).astype(jnp.bfloat16)
    if live < rows:
        x0 = jnp.concatenate(
            [x0, jnp.zeros((rows - live,) + x0.shape[1:], jnp.bfloat16)], 0)
    return x0


def _trunk_t(p, x0, spec: KernelSpec):
    b = p["b_trunk"]
    h = jnp.maximum(_dot(p["w0"], x0) + b[0], 0.0).astype(jnp.bfloat16)
    mid = 0
    for i in range(1, spec.D):
        if i == spec.skip:
            y = _dot(p["wskip_x"], x0) + _dot(p["wskip_h"], h) + b[i]
        else:
            y = _dot(p["w_mid"][mid], h) + b[i]
            mid += 1
        h = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
    return h


def _coarse_kernel_t(spec: KernelSpec, S: int, near: float, far: float,
                     lindisp: bool, names, *refs):
    od_ref, out_ref = refs[0], refs[-1]
    p = {k: r[...] for k, r in zip(names, refs[1:-2])}
    exp_bf = refs[-2][...]
    T = out_ref.shape[-1]
    # uniform z for lane p: s = p % S (reference stratified_z_vals,
    # perturb=0): z = near*(1-t) + far*t, t = s/(S-1)
    lane_s = (jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) % S
              ).astype(jnp.float32)
    t = lane_s * np.float32(1.0 / (S - 1))
    if lindisp:
        z_row = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z_row = near * (1.0 - t) + far * t
    x0 = _pts_to_x0(p, od_ref[0], z_row, exp_bf, spec)
    h = _trunk_t(p, x0, spec)
    out_ref[...] = (_dot(p["w_sigma8"], h) + p["b_sigma8"]).astype(jnp.float32)


def _fine_raw_rows(p, od, z_row, dpt_tile, exp_bf, spec):
    """Shared fine-sweep body: -> (LANES, T) f32 pre-activation raw rows
    [rgb 0:3, sigma 3, trgb 4:7, tsigma 7, tbeta 8, ...]. With
    spec.fine=False (static pack, no transient chain) only rows 0:4 are
    live: [rgb 0:3, sigma 3]."""
    x0 = _pts_to_x0(p, od, z_row, exp_bf, spec)
    h = _trunk_t(p, x0, spec)
    W = p["w_dt"].shape[0]                              # dir|trans stream width
    dpt = _dot(dpt_tile, exp_bf)[:W]                    # (W, T) f32
    dt = jnp.maximum(_dot(p["w_dt"], h) + p["b_dt_fold"] + dpt, 0.0
                     ).astype(jnp.bfloat16)
    if spec.fine:
        for i in range(3):
            dt = jnp.maximum(_dot(p["w_trans"][i], dt) + p["b_trans"][i], 0.0
                             ).astype(jnp.bfloat16)
    return _dot(p["w_heads"], dt) + _dot(p["w_sigma_pad"], h) + p["b_heads"]


def _fine_kernel_t(spec: KernelSpec, names, *refs):
    od_ref, z_ref, dpt_ref, out_ref = refs[0], refs[1], refs[2], refs[-1]
    p = {k: r[...] for k, r in zip(names, refs[3:-2])}
    exp_bf = refs[-2][...]
    z_row = z_ref[0][0:1]                               # (1, T) f32
    out = _fine_raw_rows(p, od_ref[0], z_row, dpt_ref[0], exp_bf, spec)
    out_ref[...] = out[:OUT_ROWS].astype(jnp.float32)


def _sorted_items(p: Dict):
    names = sorted(p.keys())
    return names, [p[k] for k in names]


@functools.partial(jax.jit, static_argnames=("spec", "S", "near", "far",
                                             "lindisp", "interpret"))
def coarse_sigma_t(packed: Dict, rays_o, rays_d, spec: KernelSpec, S: int,
                   near: float, far: float, lindisp: bool = False,
                   interpret: bool = False) -> jnp.ndarray:
    """Coarse sigma-only sweep over in-kernel uniform z samples.

    rays (N,3)x2 -> (N, S) f32 PRE-softplus sigma. N must be a multiple
    of tile_geometry(S)[0] (pad rays; see fast.py)."""
    N = rays_o.shape[0]
    # sigma-only sweep is VMEM-light -> bigger tiles, fewer grid steps
    # (the per-step scaffolding — o/d expansion, PE, sine — is what a
    # tiny proposal MLP pays for; amortize it). Wide trunks halve it.
    W = packed["w0"].shape[0]
    R, T = tile_geometry(S, target=4096 if W <= LANES else 2048)
    if N % R != 0:
        R, T = tile_geometry(S)
    G = N // R
    od = od_tiles_of(rays_o, rays_d, R)
    exp_bf = jnp.asarray(_expand_matrix_t(R, S)).astype(jnp.bfloat16)
    names, vals = _sorted_items(packed)
    kern = functools.partial(_coarse_kernel_t, spec, S, float(near),
                             float(far), lindisp, names)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, 16, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(names) + 1),
        out_specs=pl.BlockSpec((8, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N * S), jnp.float32),
        interpret=interpret,
    )(od, *vals, exp_bf)
    return out[0].reshape(N, S)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def fine_raw_t(packed: Dict, rays_o, rays_d, z_all, dpt,
               spec: KernelSpec, interpret: bool = False) -> jnp.ndarray:
    """Fused fine sweep: rays (N,3)x2, z_all (N,S) f32 sorted samples,
    dpt (N, LANES) per-ray conditioning rows ->
    (OUT_ROWS, N, S) f32 PRE-activation channel-major raw output
    [rgb, sigma, trgb, tsigma, tbeta] in rows 0:9."""
    N, S = z_all.shape
    W = packed["w0"].shape[0]
    R, T = tile_geometry(S, target=fine_tile_target(S, W))
    G = N // R
    od = od_tiles_of(rays_o, rays_d, R)
    z_tiles = jnp.zeros((G, 8, T), jnp.float32)
    z_tiles = z_tiles.at[:, 0, :].set(z_all.astype(jnp.float32).reshape(G, T))
    dpt_tiles = dpt_tiles_of(dpt, R)
    exp_bf = jnp.asarray(_expand_matrix_t(R, S)).astype(jnp.bfloat16)
    names, vals = _sorted_items(packed)
    kern = functools.partial(_fine_kernel_t, spec, names)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 16, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dpt_tiles.shape[1], LANES),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(names) + 1),
        out_specs=pl.BlockSpec((OUT_ROWS, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, N * S), jnp.float32),
        interpret=interpret,
    )(od, z_tiles, dpt_tiles, *vals, exp_bf)
    return out.reshape(OUT_ROWS, N, S)


def fine_tile_target(S: int, W: int = LANES) -> int:
    """Fine-sweep point-tile size: 2048 keeps the S_f=128 workload under
    the VMEM scoped limit; short culled schedules (S_f <= 48) fit 4096,
    halving the per-grid-step scaffolding (od expand, PE, sine, weight
    loads) — the dominant overhead once the matmul work per point
    shrinks. Wide MLPs (W > 128) double the per-point activation
    footprint — halve the tile to stay under the scoped limit."""
    t = 4096 if S <= 48 else 2048
    return t // 2 if W > LANES else t


def ray_tile(S: int, W: int = LANES) -> int:
    """Rays-per-tile granularity callers must pad N to (fine kernel)."""
    return tile_geometry(S, target=fine_tile_target(S, W))[0]


# ---------------------------------------------------------------------------
# training: backward kernel for the full raw sweep (fine or static pack)
#
# Recompute-in-VMEM backward: each tile re-runs the forward (activations
# never touch HBM — cheaper than stashing ~10 (128,T) tensors per tile),
# then backprops layer by layer. Weight gradients accumulate in f32
# VMEM blocks revisited across all grid steps (constant index maps);
# per-ray dpt gradients stream out per tile. Bias gradients are emitted
# as ROWS of one (16, LANES) block via ones-matmul row-sums (a (8,T)
# stationary matmul — a lane-wise reduction would need a sublane
# transpose). bf16 operands / f32 accumulation everywhere, matching the
# forward's precision contract.
# ---------------------------------------------------------------------------

def _mid_idx(i: int, skip: int) -> int:
    """w_mid stack index of trunk layer i (fwd packs 1..D-1 skipping
    `skip` in order)."""
    return i - 1 if (skip < 0 or i < skip) else i - 2


def _bwd_kernel_t(spec: KernelSpec, D_mid: int, names, *refs):
    od_ref, z_ref, dpt_ref, g_ref = refs[0], refs[1], refs[2], refs[3]
    n_par = len(names)
    p = {k: r[...] for k, r in zip(names, refs[4:4 + n_par])}
    exp_bf = refs[4 + n_par][...]
    outs = refs[5 + n_par:]
    if spec.fine:
        (dw0_ref, dwsx_ref, dwsh_ref, dwmid_ref, dwdt_ref, dwtr_ref,
         dwhd_ref, dwsg_ref, dbias_ref, gdpt_ref) = outs
    else:
        (dw0_ref, dwsx_ref, dwsh_ref, dwmid_ref, dwdt_ref,
         dwhd_ref, dwsg_ref, dbias_ref, gdpt_ref) = outs
        dwtr_ref = None

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in outs[:-1]:
            r[...] = jnp.zeros(r.shape, r.dtype)

    T = exp_bf.shape[-1]
    z_row = z_ref[0][0:1]
    bf = jnp.bfloat16

    # ---- forward recompute, stashing activations in VMEM
    x0 = _pts_to_x0(p, od_ref[0], z_row, exp_bf, spec)      # (rows,T) bf16
    b = p["b_trunk"]
    hs = [jnp.maximum(_dot(p["w0"], x0) + b[0], 0.0).astype(bf)]
    mid = 0
    for i in range(1, spec.D):
        if i == spec.skip:
            y = _dot(p["wskip_x"], x0) + _dot(p["wskip_h"], hs[-1]) + b[i]
        else:
            y = _dot(p["w_mid"][mid], hs[-1]) + b[i]
            mid += 1
        hs.append(jnp.maximum(y, 0.0).astype(bf))
    h_last = hs[-1]
    W = p["w_dt"].shape[0]
    dpt = _dot(dpt_ref[0], exp_bf)[:W]
    dts = [jnp.maximum(_dot(p["w_dt"], h_last) + p["b_dt_fold"] + dpt,
                       0.0).astype(bf)]
    if spec.fine:
        for i in range(3):
            dts.append(jnp.maximum(
                _dot(p["w_trans"][i], dts[-1]) + p["b_trans"][i],
                0.0).astype(bf))

    # ---- backward
    ones8 = jnp.ones((8, T), bf)

    def dmm(a, bm):
        """(rA,T)·(rB,T) -> (rA,rB) f32, contracting lanes (T)."""
        if jax.default_backend() == "cpu":
            a, bm = a.astype(jnp.float32), bm.astype(jnp.float32)
        return jax.lax.dot_general(a, bm, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def tmm(w, g):
        """(r,c)·(r,T) -> (c,T) f32: W^T @ g without a layout transpose
        (MXU handles the transposed contraction natively)."""
        if jax.default_backend() == "cpu":
            w, g = w.astype(jnp.float32), g.astype(jnp.float32)
        return jax.lax.dot_general(w, g, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # Cotangents cast to bf16 between layers (single cast). An hi/lo
    # split of every cotangent operand was probed for wide trunks
    # (W=256) and CLOSED as a negative: it tightened one-step grad
    # parity 5%->3.2% but did NOT recover the fused-vs-XLA trained-
    # quality gap (seed-0 +0.06 dB, seed-1 -0.74 dB — inside trajectory
    # noise) at 2.6x train cost. See QUALITY.md round-4 frontier.

    def bias_row(j, g_pre):
        row = dmm(ones8, g_pre)[0:1]
        dbias_ref[j:j + 1, 0:row.shape[1]] += row

    g16 = g_ref[...]                                        # (OUT_ROWS,T) f32
    g_full = jnp.concatenate(
        [g16, jnp.zeros((LANES - OUT_ROWS, T), jnp.float32)], 0)
    g16b = g16.astype(bf)
    dt_last = dts[-1]
    dwhd_ref[...] += dmm(g16b, dt_last)
    dwsg_ref[...] += dmm(g16b, h_last)
    g_fullb = g_full.astype(bf)
    bias_row(spec.D + 4, g_fullb)                           # b_heads
    g_dt = tmm(p["w_heads"], g_fullb)                       # (W, T) f32
    g_h = tmm(p["w_sigma_pad"], g_fullb)                    # (W, T) f32

    if spec.fine:
        for i in (2, 1, 0):
            g_pre = jnp.where(dts[i + 1].astype(jnp.float32) > 0.0,
                              g_dt, 0.0).astype(bf)
            dwtr_ref[i] += dmm(g_pre, dts[i])
            bias_row(spec.D + 1 + i, g_pre)
            g_dt = tmm(p["w_trans"][i], g_pre)
    # masks compare in f32: Mosaic on v5e rejects bf16 predicates
    g_pre0 = jnp.where(dts[0].astype(jnp.float32) > 0.0, g_dt, 0.0).astype(bf)
    dwdt_ref[...] += dmm(g_pre0, h_last)
    bias_row(spec.D, g_pre0)                                # b_dt_fold
    gdpt_ref[0] = dmm(g_pre0, exp_bf)                       # (LANES, LANES)
    g_h = g_h + tmm(p["w_dt"], g_pre0)

    for i in range(spec.D - 1, 0, -1):
        g_pre = jnp.where(hs[i].astype(jnp.float32) > 0.0,
                          g_h, 0.0).astype(bf)
        bias_row(i, g_pre)
        if i == spec.skip:
            dwsx_ref[...] += dmm(g_pre, x0)
            dwsh_ref[...] += dmm(g_pre, hs[i - 1])
            g_h = tmm(p["wskip_h"], g_pre)
        else:
            m = _mid_idx(i, spec.skip)
            dwmid_ref[m] += dmm(g_pre, hs[i - 1])
            g_h = tmm(p["w_mid"][m], g_pre)
    g_pre = jnp.where(hs[0].astype(jnp.float32) > 0.0, g_h, 0.0).astype(bf)
    bias_row(0, g_pre)
    dw0_ref[...] += dmm(g_pre, x0)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def raw_bwd_t(packed: Dict, rays_o, rays_d, z_all, dpt, g,
              spec: KernelSpec, interpret: bool = False):
    """Backward of fine_raw_t w.r.t. the packed weights and dpt.

    g: (OUT_ROWS, N, S) f32 cotangent of the raw output. Returns
    (d_packed, d_dpt): d_packed has cotangents for every weight-derived
    entry of the pack (zeros for the constant pe_m/pe_phase rows) and
    d_dpt is (N, LANES) f32. No cotangents for rays/z (the callers'
    contract: z is sampled under stop_gradient and rays carry no
    trainable parameters in stage 1 — see render/fused_train.py)."""
    N, S = z_all.shape
    # smaller tiles than the forward: ~13 stashed activations + f32
    # grad blocks must fit VMEM together (halved again for wide trunks)
    bwd_W = packed["w0"].shape[0]
    R, T = tile_geometry(S, target=1024 if bwd_W <= LANES else 512)
    if N % R != 0:
        raise ValueError(f"N={N} not a multiple of bwd ray tile {R}")
    G = N // R
    od = od_tiles_of(rays_o, rays_d, R)
    z_tiles = jnp.zeros((G, 8, T), jnp.float32)
    z_tiles = z_tiles.at[:, 0, :].set(z_all.astype(jnp.float32).reshape(G, T))
    dpt_tiles = dpt_tiles_of(dpt, R)
    g_r = g.reshape(OUT_ROWS, G * T)
    exp_bf = jnp.asarray(_expand_matrix_t(R, S)).astype(jnp.bfloat16)
    names, vals = _sorted_items(packed)
    D_mid = spec.D - (2 if spec.skip > 0 else 1)
    kern = functools.partial(_bwd_kernel_t, spec, D_mid, names)
    rows = packed["w0"].shape[1]
    W = packed["w0"].shape[0]              # trunk width = dt-stream width
    bcols = max(W, LANES)                  # bias rows span W or LANES
    f32 = jnp.float32
    acc = lambda *shape: jax.ShapeDtypeStruct(shape, f32)
    out_shape = [
        acc(W, rows),                # d_w0
        acc(W, rows),                # d_wskip_x
        acc(W, W),                   # d_wskip_h
        acc(max(D_mid, 1), W, W),    # d_wmid
        acc(W, W),                   # d_wdt
    ]
    if spec.fine:
        out_shape.append(acc(3, W, W))  # d_wtrans
    # bias rows 0..D-1 trunk, D dt_fold, D+1..D+3 trans, D+4 heads —
    # round the block up to an 8-sublane multiple so deep MLPs fit
    brows = -(-(spec.D + 5) // 8) * 8
    out_shape += [
        acc(OUT_ROWS, W),            # d_wheads (rows 0:16)
        acc(OUT_ROWS, W),            # d_wsigma (rows 0:16)
        acc(brows, bcols),           # d_bias rows
        acc(G, W, LANES),            # g_dpt per tile (features, ray cols)
    ]
    const = lambda r: pl.BlockSpec(r, lambda i: (0,) * len(r),
                                   memory_space=pltpu.VMEM)
    out_specs = [
        const((W, rows)), const((W, rows)), const((W, W)),
        const((max(D_mid, 1), W, W)), const((W, W)),
    ]
    if spec.fine:
        out_specs.append(const((3, W, W)))
    out_specs += [
        const((OUT_ROWS, W)), const((OUT_ROWS, W)), const((brows, bcols)),
        pl.BlockSpec((1, W, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    outs = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 16, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dpt_tiles.shape[1], LANES),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT_ROWS, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(names) + 1),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(od, z_tiles, dpt_tiles, g_r, *vals, exp_bf)

    if spec.fine:
        (dw0, dwsx, dwsh, dwmid, dwdt, dwtr, dwhd, dwsg, dbias, gdpt) = outs
    else:
        (dw0, dwsx, dwsh, dwmid, dwdt, dwhd, dwsg, dbias, gdpt) = outs
        dwtr = None

    d_packed = {k: jnp.zeros_like(v) for k, v in packed.items()}
    d_packed["w0"] = dw0.astype(packed["w0"].dtype)
    if "wskip_x" in packed:
        d_packed["wskip_x"] = dwsx.astype(packed["wskip_x"].dtype)
        d_packed["wskip_h"] = dwsh.astype(packed["wskip_h"].dtype)
    if "w_mid" in packed:
        d_packed["w_mid"] = dwmid[:packed["w_mid"].shape[0]].astype(
            packed["w_mid"].dtype)
    d_packed["w_dt"] = dwdt.astype(packed["w_dt"].dtype)
    if spec.fine:
        d_packed["w_trans"] = dwtr.astype(packed["w_trans"].dtype)
    pad_rows = jnp.zeros((LANES - OUT_ROWS, W), f32)
    d_packed["w_heads"] = jnp.concatenate([dwhd, pad_rows], 0).astype(
        packed["w_heads"].dtype)
    d_packed["w_sigma_pad"] = jnp.concatenate([dwsg, pad_rows], 0).astype(
        packed["w_sigma_pad"].dtype)
    D = spec.D
    d_packed["b_trunk"] = dbias[:D, :W, None]
    d_packed["b_dt_fold"] = dbias[D, :W, None]
    if spec.fine:
        d_packed["b_trans"] = dbias[D + 1:D + 4, :W, None]
    d_packed["b_heads"] = dbias[D + 4, :LANES, None]

    # per-tile (features, ray-cols) -> (N, W) per-ray rows
    g_dpt = jnp.transpose(gdpt, (0, 2, 1))[:, :R].reshape(N, W)
    return d_packed, g_dpt


def coarse_ray_tile(S: int, W: int = LANES) -> int:
    """Preferred rays-per-tile of the sigma-only kernel (bigger tiles)."""
    return tile_geometry(S, target=4096 if W <= LANES else 2048)[0]


# ---------------------------------------------------------------------------
# mono path: in-kernel sampling + compositing
#
# Two more kernels that remove the remaining XLA glue from the hot path
# (the proposal launch + sigma composite + inverse-CDF masked reductions
# and the SoA composite cost ~5 ms per 16K-ray chunk):
#   proposal_z_rows: rays -> SORTED fine z samples (blended-CDF mode),
#     with the proposal sweep, sigma->weights compositing, per-ray CDF
#     and its inverse all in VMEM;
#   fine_composite_t: the fine sweep + full NeRF-W test-time compositing
#     in VMEM -> (8, N) per-ray outputs [rgb, acc, depth, static rgb].
# Per-ray scans/reductions run on the lanes-are-samples layout: samples
# of a ray are S consecutive lanes, so transmittance is a log-step
# masked-roll prefix product and per-ray sums are one f32 matmul against
# the expansion matrix. Transcendentals use bit-twiddled exp2/log2
# polynomials (Mosaic's exp/log are ~25x too slow, like sin).
# ---------------------------------------------------------------------------

_EXP2_COEFFS = None
_LOG2_COEFFS = None
_LOG2E = float(np.log2(np.e))
_LN2 = float(np.log(2.0))


def _exp2_coeffs() -> np.ndarray:
    """Degree-5 fit of 2^f on f in [-0.5, 0.5] (max err ~2e-8 rel)."""
    global _EXP2_COEFFS
    if _EXP2_COEFFS is None:
        f = 0.5 * np.cos(np.linspace(0.0, np.pi, 4001))
        A = np.stack([np.ones_like(f), f, f**2, f**3, f**4, f**5], -1)
        c, *_ = np.linalg.lstsq(A, 2.0 ** f, rcond=None)
        _EXP2_COEFFS = c.astype(np.float32)
    return _EXP2_COEFFS


def _log2_coeffs() -> np.ndarray:
    """Degree-6 fit of log2(m) on m in [1, 2) (max err ~1e-6)."""
    global _LOG2_COEFFS
    if _LOG2_COEFFS is None:
        m = 1.5 + 0.5 * np.cos(np.linspace(0.0, np.pi, 4001))
        A = np.stack([np.ones_like(m), m, m**2, m**3, m**4, m**5, m**6], -1)
        c, *_ = np.linalg.lstsq(A, np.log2(m), rcond=None)
        _LOG2_COEFFS = c.astype(np.float32)
    return _LOG2_COEFFS


def _fast_exp2(x):
    """2^x via round-and-poly + exponent bit assembly (VPU-only)."""
    if jax.default_backend() == "cpu":
        return jnp.exp2(x)
    c = [float(v) for v in _exp2_coeffs()]
    x = jnp.clip(x, -125.0, 125.0)
    n = jnp.round(x)
    f = x - n
    p = c[0] + f * (c[1] + f * (c[2] + f * (c[3] + f * (c[4] + f * c[5]))))
    scale = pltpu.bitcast((n.astype(jnp.int32) + 127) << 23, jnp.float32)
    return p * scale


def _fast_log2(x):
    """log2(x) for x > 0 via exponent extraction + mantissa poly."""
    if jax.default_backend() == "cpu":
        return jnp.log2(x)
    c = [float(v) for v in _log2_coeffs()]
    bits = pltpu.bitcast(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = pltpu.bitcast((bits & 0x007FFFFF) | (127 << 23), jnp.float32)
    p = c[0] + m * (c[1] + m * (c[2] + m * (c[3] + m * (c[4] + m * (c[5] + m * c[6])))))
    return e.astype(jnp.float32) + p


def _fast_exp(x):
    return _fast_exp2(x * _LOG2E)


def _k_softplus(x):
    """softplus(x) = log(1+e^x), switching to identity for large x."""
    sp = _fast_log2(1.0 + _fast_exp2(jnp.minimum(x, 15.0) * _LOG2E)) * _LN2
    return jnp.where(x > 15.0, x, sp)


def _k_sigmoid(x):
    return 1.0 / (1.0 + _fast_exp(-x))


def _roll_lanes(x, k: int):
    if jax.default_backend() == "cpu":
        return jnp.roll(x, k, axis=1)
    if k < 0:
        k += x.shape[1]          # pltpu.roll wants non-negative shifts
    return pltpu.roll(x, k, 1)


def _roll_rows(x, k: int):
    if jax.default_backend() == "cpu":
        return jnp.roll(x, k, axis=0)
    return pltpu.roll(x, k, 0)


def _group_prefix_prod_excl(om, S: int):
    """Exclusive prefix product of om within consecutive S-lane groups:
    out_l = prod_{j<l in group} om_j (the transmittance before sample l).
    om: (rows, T) f32."""
    pos = jax.lax.broadcasted_iota(jnp.int32, om.shape, 1) % S
    x = jnp.where(pos >= 1, _roll_lanes(om, 1), 1.0)
    k = 1
    while k < S:
        x = x * jnp.where(pos >= k, _roll_lanes(x, k), 1.0)
        k *= 2
    return x


def _row_prefix_sum(x, n_rows: int):
    """Inclusive prefix sum along rows (axis 0). x: (n_rows, C) f32."""
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < n_rows:
        x = x + jnp.where(pos >= k, _roll_rows(x, k), 0.0)
        k *= 2
    return x


def _sel_matrix(S: int, T: int) -> np.ndarray:
    """(S, T) one-hot: row s lights lanes with p % S == s."""
    E = np.zeros((S, T), np.float32)
    E[np.arange(T) % S, np.arange(T)] = 1.0
    return E


def _weights_from_sigma(sigma, S: int, near: float, far: float):
    """(1,T) sigma over in-kernel uniform z -> (1,T) composite weights
    (sigma-only raw2outputs_NeRFW: 1e2 terminal delta)."""
    T = sigma.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) % S
    step = np.float32((far - near) / (S - 1))
    delta = jnp.where(pos == S - 1, np.float32(1e2), step)
    alpha = 1.0 - _fast_exp(-delta * sigma)
    trans = _group_prefix_prod_excl(1.0 - alpha, S)
    return alpha * trans


def _sample_kernel_t(spec: KernelSpec, S: int, S_f: int, near: float,
                     far: float, lam: float, names, *refs):
    """refs: od_tile (16,LANES) bf16 hi/lo, *params, exp_bf (LANES,T)
    bf16, e_sel (S,T), exp_out (LANES,T_out) f32, sel_f (S_f,T_out) f32,
    out (8, T_out)."""
    od_ref, out_ref = refs[0], refs[-1]
    p = {k: r[...] for k, r in zip(names, refs[1:-5])}
    exp_bf = refs[-5][...]
    e_sel = refs[-4][...]
    exp_out = refs[-3][...]
    sel_f = refs[-2][...]
    T = exp_bf.shape[-1]

    pos = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) % S
    t = pos.astype(jnp.float32) * np.float32(1.0 / (S - 1))
    z_row = np.float32(near) * (1.0 - t) + np.float32(far) * t
    x0 = _pts_to_x0(p, od_ref[0], z_row, exp_bf, spec)
    h = _trunk_t(p, x0, spec)
    sig_pre = (_dot(p["w_sigma8"], h) + p["b_sigma8"])[0:1]
    sigma = _k_softplus(sig_pre)
    w = _weights_from_sigma(sigma, S, near, far)          # (1, T)

    # per-ray transpose: (S rows, LANES ray cols); ray cols >= R are 0.
    # exp is a 0/1 selector, exact in bf16; the spread stays f32.
    spread = w * exp_bf.astype(jnp.float32)                # (LANES, T)
    w_sr = jax.lax.dot_general(e_sel, spread, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    mass = w_sr[1:S - 1] + np.float32(1e-5)                # (S-2, LANES)
    tot = jnp.sum(mass, axis=0, keepdims=True)
    pdf = mass / tot
    cdf_rows = _row_prefix_sum(pdf, S - 2)                 # inclusive

    # inverse CDF of the blended mixture at u = linspace(0,1,S_f);
    # z_mid bin edges are uniform -> host constants on the host side of
    # the closure (static python floats)
    step = (far - near) / (S - 1)
    zmid = [near + (j + 0.5) * step for j in range(S - 1)]
    span = zmid[-1] - zmid[0]
    lamf = np.float32(lam)
    u = (jax.lax.broadcasted_iota(jnp.int32, (S_f, LANES), 0)
         .astype(jnp.float32) * np.float32(1.0 / (S_f - 1)))  # (S_f, LANES)
    big = jnp.float32(1e10)
    below = jnp.zeros((S_f, LANES), jnp.float32)
    b_bin = jnp.full((S_f, LANES), np.float32(zmid[0]))
    above = jnp.full((S_f, LANES), big)
    a_bin = jnp.full((S_f, LANES), big)
    for j in range(S - 1):
        cj_w = cdf_rows[j - 1:j] if j > 0 else jnp.zeros((1, LANES), jnp.float32)
        cdf_u_j = np.float32((zmid[j] - zmid[0]) / span)
        cj = (1.0 - lamf) * cj_w + lamf * cdf_u_j          # (1, LANES)
        le = cj <= u                                       # (S_f, LANES)
        below = jnp.where(le, cj, below)
        b_bin = jnp.where(le, np.float32(zmid[j]), b_bin)
        above = jnp.minimum(above, jnp.where(le, big, cj))
        a_bin = jnp.minimum(a_bin, jnp.where(le, big, np.float32(zmid[j])))
    last_cdf = (1.0 - lamf) * cdf_rows[S - 3:S - 2] + lamf * 1.0
    above = jnp.where(above >= big / 2, last_cdf, above)
    a_bin = jnp.where(a_bin >= big / 2, np.float32(zmid[-1]), a_bin)
    denom = above - below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    tt = (u - below) / denom
    z = b_bin + tt * (a_bin - b_bin)                       # (S_f, LANES)

    # flatten to ray-major point lanes: z_pt[p] = z[p % S_f, p // S_f]
    zz = jax.lax.dot_general(z, exp_out, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    z_pt = jnp.sum(zz * sel_f, axis=0, keepdims=True)      # (1, T_out)
    out_ref[...] = jnp.concatenate(
        [z_pt, jnp.zeros((7, z_pt.shape[-1]), jnp.float32)], axis=0)


@functools.partial(jax.jit, static_argnames=("spec", "S", "S_f", "near",
                                             "far", "lam", "interpret"))
def proposal_z_rows(packed: Dict, rays_o, rays_d, spec: KernelSpec, S: int,
                    S_f: int, near: float, far: float, lam: float,
                    interpret: bool = False) -> jnp.ndarray:
    """One-kernel sample placement: rays -> (8, N*S_f) f32 with row 0 =
    SORTED blended-CDF fine z samples in ray-major point order (the fine
    kernel's z_rows input). Matches render/fast.sample_pdf_blend over
    weights composited from the packed sigma-MLP at S uniform samples."""
    N = rays_o.shape[0]
    W = packed["w0"].shape[0]
    R, T = tile_geometry(S, target=2048 if W <= LANES else 1024)
    if N % R != 0:
        raise ValueError(f"N={N} not a multiple of sampling ray tile {R}")
    G = N // R
    T_out = R * S_f
    od = od_tiles_of(rays_o, rays_d, R)
    exp_bf = jnp.asarray(_expand_matrix_t(R, S)).astype(jnp.bfloat16)
    e_sel = jnp.asarray(_sel_matrix(S, T))
    exp_out = jnp.asarray(_expand_matrix_t(R, S_f))
    sel_f = jnp.asarray(_sel_matrix(S_f, T_out))
    names, vals = _sorted_items(packed)
    kern = functools.partial(_sample_kernel_t, spec, S, S_f, float(near),
                             float(far), float(lam), names)
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, 16, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(names) + 4),
        out_specs=pl.BlockSpec((8, T_out), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N * S_f), jnp.float32),
        interpret=interpret,
    )(od, *vals, exp_bf, e_sel, exp_out, sel_f)


# Output rows of the compositing fine kernel: per-ray
# [rgb(0:3), acc(3), static depth(4), static rgb(5:8)]
COMP_ROWS = 8


def _fine_composite_kernel_t(spec: KernelSpec, S: int, names, *refs):
    """Fine sweep + full NeRF-W test-time compositing in VMEM.
    refs: od (16,LANES) bf16 hi/lo, z_rows (8,T), dpt, *params,
    exp_f32 (f32, for the per-ray contrib reduction), exp_bf,
    out (8,LANES)."""
    od_ref, z_ref, dpt_ref, out_ref = refs[0], refs[1], refs[2], refs[-1]
    p = {k: r[...] for k, r in zip(names, refs[3:-3])}
    exp_f32 = refs[-3][...]
    exp_bf = refs[-2][...]
    z_row = z_ref[0:1, :]                               # (1, T) f32
    raw = _fine_raw_rows(p, od_ref[0], z_row, dpt_ref[0], exp_bf, spec)

    # activations + composite (volume.composite_nerfw, test_time=True)
    srgb = _k_sigmoid(raw[0:3])
    ssig = _k_softplus(raw[3:4])
    trgb = _k_sigmoid(raw[4:7])
    tsig = _k_softplus(raw[7:8])
    T = z_row.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) % S
    z_next = _roll_lanes(z_row, -1)
    delta = jnp.where(pos == S - 1, np.float32(1e2), z_next - z_row)
    sa = 1.0 - _fast_exp(-delta * ssig)
    ta = 1.0 - _fast_exp(-delta * tsig)
    alphas = 1.0 - _fast_exp(-delta * (ssig + tsig))
    trans = _group_prefix_prod_excl(1.0 - alphas, S)
    s_trans = _group_prefix_prod_excl(1.0 - sa, S)
    static_w = sa * trans
    transient_w = ta * trans
    weights = alphas * trans
    static_w_only = sa * s_trans

    contrib = jnp.concatenate([
        static_w * srgb + transient_w * trgb,   # rgb (3,T)
        weights,                                # acc (1,T)
        static_w_only * z_row,                  # depth (1,T)
        static_w_only * srgb,                   # static rgb (3,T)
    ], axis=0)                                  # (8, T)
    per_ray = jax.lax.dot_general(
        contrib, exp_f32, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # (8, LANES) — cols = rays
    out_ref[...] = per_ray


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def fine_composite_t(packed: Dict, rays_o, rays_d, z_rows, dpt,
                     spec: KernelSpec, interpret: bool = False) -> jnp.ndarray:
    """Fused fine sweep + compositing.

    z_rows: (8, N*S_f) f32, row 0 = sorted z per point (ray-major) —
    proposal_z_rows output, or built from (N, S_f) z_all.
    Returns (COMP_ROWS, N): [rgb, acc, static depth, static rgb]."""
    P = z_rows.shape[-1]
    N = rays_o.shape[0]
    S = P // N
    W = packed["w0"].shape[0]
    R, T = tile_geometry(S, target=fine_tile_target(S, W))
    G = N // R
    od = od_tiles_of(rays_o, rays_d, R)
    dpt_tiles = dpt_tiles_of(dpt, R)
    exp_f32 = jnp.asarray(_expand_matrix_t(R, S))
    exp_bf = exp_f32.astype(jnp.bfloat16)
    names, vals = _sorted_items(packed)
    kern = functools.partial(_fine_composite_kernel_t, spec, S, names)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 16, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dpt_tiles.shape[1], LANES),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(names) + 2),
        out_specs=pl.BlockSpec((COMP_ROWS, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((COMP_ROWS, G * LANES), jnp.float32),
        interpret=interpret,
    )(od, z_rows, dpt_tiles, *vals, exp_f32, exp_bf)
    # cols per tile: first R are real rays, rest zero -> compact
    out = out.reshape(COMP_ROWS, G, LANES)[:, :, :R]
    return out.reshape(COMP_ROWS, N)
