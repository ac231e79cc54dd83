#!/usr/bin/env python
"""W=256 render-schedule frontier probe (VERDICT r4 item 4).

For each candidate culled schedule, measures on the trained W=256
synthetic checkpoint (assets/nerfh_synthetic_301_w256.npz):
  - throughput (M rays/s) under bench.py's 1M-rays-per-call protocol
  - val PSNR of the same fast path vs the XLA reference-schedule render
    (parity bar: within 0.1 dB of the XLA render, QUALITY.md protocol)

Usage: python scripts/probe_w256.py [--schedules nf24,nf16 ...]
       python scripts/probe_w256.py --psnr_only   (CPU-safe, no timing)
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dfnet_tpu.config import parse_args
from dfnet_tpu.data.synthetic import make_synthetic_scene
from dfnet_tpu.models.factory import create_nerfh, render_settings
from dfnet_tpu.render.fast import FastNeRFH, render_image_fast, render_rays_fast
from dfnet_tpu.render.rays import get_rays
from dfnet_tpu.render.volume import render_image
from dfnet_tpu.training.checkpoints import load_pytree

CKPT = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                "assets", "nerfh_synthetic_301_w256.npz")

# candidate schedules: (name, cull_q, n_fine, n_place)
SCHEDULES = {
    "nf24_p32": (2e-3, 24, 32),     # the W=128-tuned default
    "nf16_p32": (2e-3, 16, 32),
    "nf16_p24": (2e-3, 16, 24),
    "nf12_p32": (2e-3, 12, 32),
    "nf24_q5e3": (5e-3, 24, 32),
    "nf16_q5e3": (5e-3, 16, 32),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--schedules", default="nf24_p32,nf16_p32")
    ap.add_argument("--psnr_only", action="store_true")
    ap.add_argument("--skip_xla", action="store_true",
                    help="reuse the XLA PSNR from a previous run")
    ap.add_argument("--chunk", type=int, default=1 << 14)
    a = ap.parse_args()

    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--precision", "bf16", "--netwidth", "256", "--netwidth_fine", "256",
    ], stage="nerf")
    scene = make_synthetic_scene(n_train=24, n_val=6, H=48, W=64,
                                 focal=60.0, seed=0, appearance_jitter=0.1)
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    loaded, _ = load_pytree(CKPT)
    params = jax.tree.map(jnp.asarray, loaded)
    settings = render_settings(cfg, scene.near, scene.far, test=True)
    fast = FastNeRFH.pack(params, model)
    H, W, focal = scene.H, scene.W, scene.focal

    def val_psnr_fast(**kw):
        ps = []
        for i in range(len(scene.val)):
            out = render_image_fast(
                params, model, jnp.asarray(scene.val.poses[i]),
                jnp.asarray(scene.val.hists[i]), H, W, focal,
                settings, chunk=a.chunk, fuse_composite=True,
                interpret=False, **kw)
            mse = float(np.mean((np.asarray(out["rgb"], np.float32)
                                 - scene.val.images[i]) ** 2))
            ps.append(-10 * np.log10(max(mse, 1e-10)))
        return float(np.mean(ps))

    if not a.skip_xla:
        ps = []
        for i in range(len(scene.val)):
            out = render_image(params, model, jnp.asarray(scene.val.poses[i]),
                               jnp.asarray(scene.val.hists[i]), H, W, focal,
                               settings, chunk=a.chunk)
            mse = float(np.mean((np.asarray(out["rgb"], np.float32)
                                 - scene.val.images[i]) ** 2))
            ps.append(-10 * np.log10(max(mse, 1e-10)))
        print(f"[probe] XLA reference-schedule val PSNR: "
              f"{float(np.mean(ps)):.3f} dB", flush=True)

    # 1M-ray throughput protocol (bench.py): scalar-checksum sync
    ro_l, rd_l = [], []
    for i in range(len(scene.val)):
        o, d = get_rays(H, W, focal, jnp.asarray(scene.val.poses[i]))
        ro_l.append(o.reshape(-1, 3))
        rd_l.append(d.reshape(-1, 3))
    rays_o_all = jnp.concatenate(ro_l)
    rays_d_all = jnp.concatenate(rd_l)
    hist1 = jnp.zeros((1, cfg.hist_bin), jnp.int32)

    for name in a.schedules.split(","):
        q, nf, np_ = SCHEDULES[name]
        kw = dict(cull_q=q, n_fine=nf, n_place=np_)
        psnr = val_psnr_fast(**kw)
        print(f"[probe] {name}: val PSNR {psnr:.3f} dB", flush=True)
        if a.psnr_only:
            continue
        align = fast.ray_align(settings, nf, np_)
        chunk = max(a.chunk // align, 1) * align
        n = ((1 << 20) // chunk) * chunk
        n_chunks = n // chunk
        reps = -(-n // rays_o_all.shape[0])
        rays_o = jnp.tile(rays_o_all, (reps, 1))[:n]
        rays_d = jnp.tile(rays_d_all, (reps, 1))[:n]

        @jax.jit
        def render_checksum(rays_o, rays_d, jitter):
            rays_o = rays_o + jitter
            def body(args):
                o, d = args
                r = render_rays_fast(fast, o, d, hist1, settings,
                                     interpret=False, fuse_composite=True,
                                     **kw)
                return jnp.sum(r["rgb"])
            return jnp.sum(jax.lax.map(
                body, (rays_o.reshape(n_chunks, chunk, 3),
                       rays_d.reshape(n_chunks, chunk, 3))))

        float(render_checksum(rays_o, rays_d, jnp.float32(0.0)))  # compile
        best = 0.0
        for r in range(3):
            t0 = time.perf_counter()
            s = float(render_checksum(rays_o, rays_d, jnp.float32(1e-5 * r)))
            dt = time.perf_counter() - t0
            best = max(best, n / dt)
        print(f"[probe] {name}: {best / 1e6:.2f} M rays/s "
              f"(chunk {chunk}, psnr {psnr:.3f})", flush=True)


if __name__ == "__main__":
    main()
