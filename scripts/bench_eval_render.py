#!/usr/bin/env python
"""Eval-render dispatch amortization bench (VERDICT r3 #7).

Times NeRFTrainer's eval renders per view two ways on the trained
synthetic checkpoint: per-view dispatch (one jit call + host fetch per
view — pays the relay's fixed ~20-40 ms each time) vs the batched
render_split path (VIEWS_PER_CALL views per dispatch via lax.map).

Usage: python scripts/bench_eval_render.py [--views 24]
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
from dfnet_tpu.training.checkpoints import load_pytree
from dfnet_tpu.training.nerf_trainer import NeRFTrainer

CKPT = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                "assets", "nerfh_synthetic_301.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=24)
    a = ap.parse_args()

    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--precision", "bf16", "--N_rand", "1024",
    ], stage="nerf")
    scene = make_synthetic_scene(n_train=a.views, n_val=6, H=48, W=64,
                                 focal=60.0, seed=0, appearance_jitter=0.1)
    tr = NeRFTrainer(cfg, scene)
    loaded, _ = load_pytree(CKPT)
    tr.params = jax.tree.map(jnp.asarray, loaded)

    split = scene.train
    n = a.views

    # per-view dispatch (the pre-round-4 render_split behavior)
    def per_view():
        outs = []
        for i in range(n):
            out = tr._render(tr.params, jnp.asarray(split.poses[i]),
                             jnp.asarray(split.hists[i]), jnp.float32(0))
            outs.append(np.asarray(out["rgb"]))
        return outs

    per_view()  # compile + warm
    t0 = time.perf_counter()
    per_view()
    dt_per = (time.perf_counter() - t0) / n

    # batched render_split (also computes PSNR on host, so slightly MORE
    # host work than the loop above — still the dispatch win dominates)
    tr.render_split(split)  # compile + warm
    t0 = time.perf_counter()
    tr.render_split(split)
    dt_batch = (time.perf_counter() - t0) / n

    print(f"eval render per view ({scene.H}x{scene.W}, {n} views): "
          f"per-view dispatch {dt_per*1e3:.1f} ms, "
          f"batched render_split {dt_batch*1e3:.1f} ms "
          f"({dt_per/dt_batch:.2f}x)")


if __name__ == "__main__":
    main()
