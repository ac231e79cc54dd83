#!/usr/bin/env python
"""Stage-2 convergence parity: feature_precision bf16 vs fp32.

Loads the trained 301-epoch stage-1 checkpoint
(assets/nerfh_synthetic_301.npz — regenerate with
scripts/quality_synthetic.py) and runs the SAME stage-2 DFNet training
(triplet + RVS through the frozen NeRF, seeds fixed) once per precision,
reporting train/val loss and median pose error. Backs the QUALITY.md
mixed-precision table and the claim in tests/test_feature_bf16.py that
bf16 convergence is validated end-to-end.

Usage: python scripts/quality_stage2_precision.py [--epochs 12]
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from dfnet_tpu.config import parse_args
from dfnet_tpu.data.synthetic import make_synthetic_scene
from dfnet_tpu.models.factory import create_nerfh
from dfnet_tpu.training.checkpoints import load_pytree
from dfnet_tpu.training.feature_trainer import FeatureTrainer
from dfnet_tpu.training.nerf_renderer import FrozenNeRF

CKPT = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                "assets", "nerfh_synthetic_301.npz")


def run(precision: str, epochs: int):
    fcfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--precision", "bf16", "--model_name", f"dfnet_{precision}",
        "--DFNet", "--featurenet_batch_size", "4", "--tripletloss",
        "--random_view_synthesis", "--tinyimg",
        "--feature_precision", precision,
    ], stage="feature")
    scene = make_synthetic_scene(n_train=24, n_val=6, H=48, W=64,
                                 focal=60.0, seed=0, appearance_jitter=0.1)
    model, _ = create_nerfh(fcfg, jax.random.PRNGKey(0))
    loaded, _ = load_pytree(CKPT)
    params = jax.tree.map(jnp.asarray, loaded)
    nerf = FrozenNeRF(fcfg, scene.hwf, scene.near, scene.far,
                      scene.world_setup, params=params, model=model)
    ft = FeatureTrainer(fcfg, scene, nerf=nerf, rng=jax.random.PRNGKey(7))
    t0 = time.time()
    rgbs = ft.prerender_train_views()
    print(f"[{precision}] prerender {time.time() - t0:.1f}s", flush=True)
    np_rng = np.random.default_rng(0)
    poses_p = virtue = None
    t0 = time.time()
    for e in range(epochs):
        if e % fcfg.rvs_refresh_rate == 0:
            poses_p, virtue = ft.rvs_refresh(np_rng)
        loss = ft.train_epoch(scene.train.images, rgbs, virtue, poses_p,
                              np_rng)
    dt = time.time() - t0
    med, _ = ft.eval_median_error()
    print(f"[{precision}] {epochs} epochs in {dt:.1f}s "
          f"({dt / epochs:.2f} s/epoch incl. host glue): "
          f"train loss {float(loss):.4f} val loss {float(ft.validate()):.4f} "
          f"median err {med[0]:.3f} m / {med[1]:.2f} deg", flush=True)
    return float(loss), med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--only", choices=["bf16", "fp32"], default=None)
    a = ap.parse_args()
    for precision in ([a.only] if a.only else ["bf16", "fp32"]):
        run(precision, a.epochs)


if __name__ == "__main__":
    main()
