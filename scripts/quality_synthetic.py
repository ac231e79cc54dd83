#!/usr/bin/env python
"""Reproduce the QUALITY.md synthetic-scene validation numbers.

Trains full-size NeRF-H (D=8/W=128, 64+64, bf16, proposal sampler on)
for 301 epochs on the analytic synthetic scene, then reports val PSNR
through every render path (XLA reference schedule vs the fused-kernel
fast paths), optionally followed by a stage-2 DFNet run with RVS
through the frozen NeRF.

Usage:  python scripts/quality_synthetic.py [--stage2]
          [--train_cull_q Q --train_fine_total N]

The optional train-cull flags run stage 1 under the culled TRAIN
schedule (per-ray interval-restricted fine sampling) so its convergence
can be compared against the reference schedule's tables in QUALITY.md.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from dfnet_tpu.config import parse_args
from dfnet_tpu.data.synthetic import make_synthetic_scene
from dfnet_tpu.render.fast import render_image_fast
from dfnet_tpu.render.volume import render_image
from dfnet_tpu.training.nerf_trainer import NeRFTrainer


def main():
    stage2 = "--stage2" in sys.argv
    epochs = 301
    if "--epochs" in sys.argv:
        epochs = int(sys.argv[sys.argv.index("--epochs") + 1])
    extra = []
    for flag in ("--train_cull_q", "--train_fine_total",
                 "--train_cull_warmup", "--netwidth", "--netwidth_fine",
                 "--netdepth", "--netdepth_fine", "--rng_seed",
                 "--fused_train"):
        if flag in sys.argv:
            extra += [flag, sys.argv[sys.argv.index(flag) + 1]]
    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--precision", "bf16", "--N_rand", "1024", *extra,
    ], stage="nerf")
    scene = make_synthetic_scene(n_train=24, n_val=6, H=48, W=64, focal=60.0,
                                 seed=0, appearance_jitter=0.1)
    tr = NeRFTrainer(cfg, scene)
    t0 = time.time()
    for e in range(epochs):
        loss, psnr = tr.train_epoch(e)
        if e % 50 == 0:
            print(f"epoch {e}: loss {loss:.4f} train-psnr {psnr:.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    print(f"trained {epochs} epochs in {time.time()-t0:.0f}s", flush=True)

    if "--save_ckpt" in sys.argv:
        from dfnet_tpu.training.checkpoints import save_pytree

        path = sys.argv[sys.argv.index("--save_ckpt") + 1]
        save_pytree(path, tr.params)
        print(f"saved params to {path}", flush=True)

    params, model, settings = tr.params, tr.model, tr.settings_test
    H, W, focal = scene.H, scene.W, scene.focal

    def val_psnr(render_fn, label):
        ps = []
        for i in range(len(scene.val)):
            rgb = np.asarray(render_fn(jnp.asarray(scene.val.poses[i]),
                                       jnp.asarray(scene.val.hists[i]))["rgb"])
            gt = scene.val.images[i]
            ps.append(-10 * np.log10(np.mean((rgb - gt) ** 2)))
        print(f"{label}: val PSNR {np.mean(ps):.3f} dB", flush=True)

    val_psnr(jax.jit(lambda p, h: render_image(
        params, model, p, h, H, W, focal, settings, chunk=4096)),
        "XLA reference schedule")
    from dfnet_tpu.render.fast import fast_path_supported
    if not fast_path_supported(model, settings):
        print("fast paths unsupported for this config (see "
              "fast_path_supported) — XLA render only", flush=True)
        return
    for label, kw in (
        ("fast + proposal placement (exact union)",
         dict(exact_union=True, use_proposal=True)),
        ("fast + coarse placement (exact union)",
         dict(exact_union=True, use_proposal=False)),
        ("fast + proposal placement (blended cdf)",
         dict(exact_union=False, use_proposal=True)),
    ):
        val_psnr(jax.jit(lambda p, h, kw=kw: render_image_fast(
            params, model, p, h, H, W, focal, settings, chunk=4096,
            interpret=False, **kw)), label)

    if stage2:
        from dfnet_tpu.training.feature_trainer import FeatureTrainer
        from dfnet_tpu.training.nerf_renderer import FrozenNeRF

        fcfg = parse_args([
            "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
            "--precision", "bf16", "--model_name", "dfnet", "--DFNet",
            "--featurenet_batch_size", "4", "--tripletloss",
            "--random_view_synthesis", "--tinyimg",
        ], stage="feature")
        nerf = FrozenNeRF(fcfg, scene.hwf, scene.near, scene.far,
                          scene.world_setup, params=params, model=model)
        ft = FeatureTrainer(fcfg, scene, nerf=nerf)
        t0 = time.time()
        rgbs = ft.prerender_train_views()
        print(f"stage2 prerender: {time.time()-t0:.1f}s for "
              f"{len(scene.train)} views", flush=True)
        np_rng = np.random.default_rng(0)
        poses_p = virtue = None
        for e in range(12):
            if e % fcfg.rvs_refresh_rate == 0:
                poses_p, virtue = ft.rvs_refresh(np_rng)
            loss = ft.train_epoch(scene.train.images, rgbs, virtue, poses_p,
                                  np_rng)
        print(f"stage2: train loss {float(loss):.4f} "
              f"val loss {float(ft.validate()):.4f}", flush=True)
        ft.eval_median_error()


if __name__ == "__main__":
    main()
