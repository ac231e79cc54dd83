#!/usr/bin/env python
"""Stage-2 (DFNet siamese) train-step microbench on the real TPU.

Reference workload (BASELINE.md): featurenet_batch_size=4 siamese pairs
at 240x427 (7-Scenes 480x640 / df=2, NeRF renders at the same size),
triplet loss + RVS pose branch. Times the jitted fused step in a
device-side loop with ONE host sync at the end (the relay adds
~35-50 ms to every synchronized call — per-step fetches would swamp
the signal).

Usage: python scripts/bench_stage2.py [--precision bf16|fp32] [--rvs]
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
from dfnet_tpu.training.feature_trainer import FeatureTrainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--H", type=int, default=240)
    ap.add_argument("--W", type=int, default=427)
    ap.add_argument("--rvs", action="store_true")
    ap.add_argument("--steps", type=int, default=10)
    a = ap.parse_args()

    argv = ["--DFNet", "--featurenet_batch_size", str(a.batch),
            "--tripletloss", "--dataset_type", "synthetic",
            "--feature_precision", a.precision]
    if a.rvs:
        argv += ["--random_view_synthesis"]
    cfg = parse_args(argv, stage="feature")
    scene = make_synthetic_scene(n_train=a.batch, n_val=1, H=a.H, W=a.W,
                                 focal=300.0, seed=0)
    tr = FeatureTrainer(cfg, scene, nerf=None)

    b = a.batch
    targets = jnp.asarray(scene.train.images[:b])
    rgbs = targets + 0.01
    p12 = jnp.asarray(scene.train.poses[:b].reshape(b, 12))
    rp = jnp.asarray(np.random.default_rng(0).uniform(
        size=(b, a.H, a.W, 3)).astype(np.float32))
    pp = p12 + 0.01
    lr = cfg.learning_rate

    def run(n):
        for _ in range(n):
            tr.params, tr.state, tr.opt_state, loss = tr._step(
                tr.params, tr.state, tr.opt_state, targets, rgbs, p12,
                rp, pp, lr)
        return float(loss)  # single sync

    t0 = time.perf_counter()
    run(2)
    print(f"compile+warm: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        loss = run(a.steps)
        dt = (time.perf_counter() - t0) / a.steps
        best = min(best, dt)
    print(f"precision={a.precision} rvs={a.rvs} B={b} {a.H}x{a.W}: "
          f"{best * 1e3:.1f} ms/step ({1.0 / best:.2f} steps/s) loss={loss:.4f}")


if __name__ == "__main__":
    main()
