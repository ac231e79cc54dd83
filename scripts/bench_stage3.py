#!/usr/bin/env python
"""Stage-3 (direct feature matching) per-image step microbench on TPU.

Reference workload (BASELINE.md): per-image loop — F predicts a pose,
the frozen NeRF renders at that pose at quarter resolution (tinyimg),
bicubic x4 upsample, siamese G features, cosine loss, grad back into F
(~1-2 s/image on the reference's GPUs). Times our jitted per-image step
(DMTrainer._step) with ONE host sync per block (the relay adds
~35-50 ms to every synchronized call).

Usage: python scripts/bench_stage3.py [--precision bf16|fp32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from dfnet_tpu.config import parse_args
from dfnet_tpu.data.synthetic import make_synthetic_scene
from dfnet_tpu.models.dfnet import DFNetConfig, init_dfnet_params
from dfnet_tpu.training.checkpoints import save_pytree
from dfnet_tpu.training.dm_trainer import DMTrainer
from dfnet_tpu.training.nerf_renderer import FrozenNeRF


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--H", type=int, default=240)
    ap.add_argument("--W", type=int, default=427)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--dm_batch_size", type=int, default=1,
                    help="K>1 times the batched step (K images/update)")
    a = ap.parse_args()

    # stage-2 checkpoint on the fly (random init — throughput only)
    ck = "/tmp/bench_s3_dfnet.npz"
    params, state = init_dfnet_params(jax.random.PRNGKey(0), DFNetConfig())
    save_pytree(ck, {"params": params, "state": state})

    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--precision", "bf16", "--DFNet", "--combine_loss",
        "--combine_loss_w", "[0., 0., 1.]", "--feature_matching_lvl", "[0]",
        "--svd_reg", "--pretrain_model_path", ck,
        "--feature_precision", a.precision,
        "--tinyimg", "--tinyscale", "4.0",
        "--dm_batch_size", str(a.dm_batch_size),
    ], stage="dm")
    scene = make_synthetic_scene(n_train=8, n_val=2, H=a.H, W=a.W,
                                 focal=300.0, seed=0)
    nerf = FrozenNeRF(cfg, scene.hwf, scene.near, scene.far,
                      scene.world_setup)
    tr = DMTrainer(cfg, scene, nerf)

    k = a.dm_batch_size
    if k > 1:
        imgs = jnp.asarray(scene.train.images[:k])
        p12s = jnp.asarray(scene.train.poses[:k].reshape(k, 12))
        hists = (jnp.asarray(scene.train.hists[:k])
                 if scene.train.hists is not None
                 else jnp.zeros((k, 10), jnp.float32))

        def run(n):
            for _ in range(n):
                tr.params, tr.opt_state, losses, psnrs = tr._step_batch(
                    tr.params, tr.opt_state, imgs, p12s, hists)
            return float(losses[0])  # single sync
    else:
        img = jnp.asarray(scene.train.images[0])
        p12 = jnp.asarray(scene.train.poses[0].reshape(12))
        hist = jnp.asarray(scene.train.hists[0]) \
            if scene.train.hists is not None else jnp.zeros((10,), jnp.float32)

        def run(n):
            for _ in range(n):
                tr.params, tr.opt_state, loss, psnr = tr._step(
                    tr.params, tr.opt_state, img, p12, hist)
            return float(loss)  # single sync

    t0 = time.perf_counter()
    run(2)
    print(f"compile+warm: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        loss = run(a.steps)
        dt = (time.perf_counter() - t0) / (a.steps * k)
        best = min(best, dt)
    print(f"precision={a.precision} {a.H}x{a.W} (render @/4) K={k}: "
          f"{best * 1e3:.1f} ms/image ({1.0 / best:.2f} img/s) loss={loss:.4f}")


if __name__ == "__main__":
    main()
