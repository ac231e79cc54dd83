#!/usr/bin/env python
"""Stage-1 (NeRF-H) train-step microbench on the real TPU.

Reference workload (BASELINE.md): N_rand=1536 rays/step, 64 coarse +
64 importance samples, bf16, fused custom-VJP kernels. Times whole
epochs (the trainer dispatches one jitted scan per epoch, so the
~35-50 ms relay latency is paid once per epoch, not per step).

The culled TRAIN schedule (--train_cull_q/--train_fine_total) restricts
the fine pass to the per-ray informative interval — the train-side
analog of the culled render that took the render bench 1.5M -> 7.2M
rays/s. Compare:

  python scripts/bench_stage1.py                      # reference schedule
  python scripts/bench_stage1.py --train_cull_q 2e-3 --train_fine_total 32
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from dfnet_tpu.config import parse_args
from dfnet_tpu.data.synthetic import make_synthetic_scene
from dfnet_tpu.training.nerf_trainer import NeRFTrainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_cull_q", type=float, default=0.0)
    ap.add_argument("--train_fine_total", type=int, default=0)
    # warmup stays 0 here (and is now 0 in config too — QUALITY.md
    # round-4 ablation): a nonzero warmup would make the benched epochs
    # silently run the reference schedule while the label says "cull"
    # (ADVICE.md round 3)
    ap.add_argument("--train_cull_warmup", type=int, default=0)
    ap.add_argument("--n_rand", type=int, default=1536)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--netwidth", type=int, default=128)
    ap.add_argument("--netwidth_fine", type=int, default=128)
    ap.add_argument("--xla_path", action="store_true",
                    help="disable the fused custom-VJP kernels")
    a = ap.parse_args()

    argv = ["--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
            "--precision", "bf16", "--N_rand", str(a.n_rand),
            "--train_cull_q", str(a.train_cull_q),
            "--train_fine_total", str(a.train_fine_total),
            "--train_cull_warmup", str(a.train_cull_warmup),
            "--netwidth", str(a.netwidth),
            "--netwidth_fine", str(a.netwidth_fine)]
    if a.xla_path:
        argv += ["--fused_train", "false"]
    cfg = parse_args(argv, stage="nerf")
    scene = make_synthetic_scene(n_train=32, n_val=1, H=48, W=64,
                                 focal=60.0, seed=0)
    tr = NeRFTrainer(cfg, scene)

    tr.train_epoch(0)  # compile + warm
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for e in range(a.epochs):
            tr.train_epoch(e + 1)
        dt = time.perf_counter() - t0
        best = max(best, a.epochs * len(scene.train) / dt)
    sched = (f"cull q={a.train_cull_q} nf={a.train_fine_total}"
             if a.train_cull_q > 0 else "reference 64+64")
    width = (f", W={a.netwidth}/{a.netwidth_fine}"
             if (a.netwidth, a.netwidth_fine) != (128, 128) else "")
    path = "fused" if getattr(tr, "uses_fused_train", False) else "xla"
    print(f"stage1 train ({sched}, N_rand={a.n_rand}{width}, "
          f"{path}): {best:.1f} steps/s")


if __name__ == "__main__":
    main()
