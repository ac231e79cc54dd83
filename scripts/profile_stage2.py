#!/usr/bin/env python
"""Stage-2 step breakdown on the real TPU (ablation timing).

jax.profiler traces don't survive the axon relay, so the breakdown is
measured by timing step VARIANTS (full / no-RVS / pose-only / feature-
only) plus component microbenches (VGG encoder fwd and fwd+bwd,
adapt+upsample+triplet fwd+bwd on synthetic tap tensors). Each item is
timed with N queued dispatches and ONE host sync (per-dispatch relay
overhead ~1-2 ms when queued; items here are >=10 ms).

Usage: python scripts/profile_stage2.py [--precision bf16] [--steps 10]
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

H, W = 240, 427


def timeit(fn, sync, steps, reps=3):
    fn()
    float(sync())  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            fn()
        float(sync())
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1e3  # ms


def trainer_for(argv, batch, scene):
    cfg = parse_args(argv, stage="feature")
    return FeatureTrainer(cfg, scene, nerf=None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    a = ap.parse_args()
    b = a.batch

    scene = make_synthetic_scene(n_train=b, n_val=1, H=H, W=W,
                                 focal=300.0, seed=0)
    targets = jnp.asarray(scene.train.images[:b])
    rgbs = targets + 0.01
    p12 = jnp.asarray(scene.train.poses[:b].reshape(b, 12))
    rp = jnp.asarray(np.random.default_rng(0).uniform(
        size=(b, H, W, 3)).astype(np.float32))
    pp = p12 + 0.01

    base = ["--DFNet", "--featurenet_batch_size", str(b),
            "--dataset_type", "synthetic",
            "--feature_precision", a.precision]
    variants = [
        ("full (triplet+RVS)", base + ["--tripletloss",
                                       "--random_view_synthesis"]),
        ("no RVS (triplet)", base + ["--tripletloss"]),
        ("pose-only", base + ["--poselossonly"]),
        ("feature-only (triplet)", base + ["--tripletloss",
                                           "--featurelossonly"]),
    ]
    results = {}
    for name, argv in variants:
        tr = trainer_for(argv, b, scene)
        lr = tr.cfg.learning_rate

        def run(tr=tr, lr=lr):
            tr.params, tr.state, tr.opt_state, tr._loss = tr._step(
                tr.params, tr.state, tr.opt_state, targets, rgbs, p12,
                rp, pp, lr)

        ms = timeit(run, lambda tr=tr: tr._loss, a.steps)
        results[name] = ms
        print(f"step [{name}]: {ms:.1f} ms", flush=True)

    # ---- component microbenches -------------------------------------
    from dfnet_tpu.models.dfnet import DFNetConfig, dfnet_forward
    from dfnet_tpu.models.vgg import vgg16_features

    tr = trainer_for(variants[0][1], b, scene)
    mcfg = DFNetConfig()
    cdt = jnp.bfloat16 if a.precision == "bf16" else jnp.float32
    params, state = tr.params, tr.state
    x2b = jnp.concatenate([targets, rgbs], 0)

    # encoder forward only (2B images)
    @jax.jit
    def enc_fwd(params, x):
        enc = jax.tree.map(lambda t: t.astype(cdt), params["encoder"])
        final, taps = vgg16_features(enc, x.astype(cdt),
                                     mcfg.hypercolumn_layers)
        return jnp.sum(final.astype(jnp.float32))

    out = {}
    ms = timeit(lambda: out.__setitem__("v", enc_fwd(params, x2b)),
                lambda: out["v"], a.steps)
    print(f"encoder fwd 2B={2*b}: {ms:.1f} ms", flush=True)

    # encoder fwd+bwd (2B images)
    @jax.jit
    def enc_fwdbwd(params, x):
        g = jax.grad(lambda p: enc_fwd_inner(p, x))(params)
        return jax.tree.leaves(g)[0].ravel()[0]

    def enc_fwd_inner(params, x):
        enc = jax.tree.map(lambda t: t.astype(cdt), params["encoder"])
        final, _ = vgg16_features(enc, x.astype(cdt),
                                  mcfg.hypercolumn_layers)
        return jnp.sum(final.astype(jnp.float32))

    ms = timeit(lambda: out.__setitem__("v", enc_fwdbwd(params, x2b)),
                lambda: out["v"], a.steps)
    print(f"encoder fwd+bwd 2B={2*b}: {ms:.1f} ms", flush=True)

    # full dfnet fwd (features + pose, siamese 2B)
    @jax.jit
    def df_fwd(params, state, x):
        feats, pose, _ = dfnet_forward(params, state, x, mcfg,
                                       return_feature=True,
                                       is_single_stream=False,
                                       upsample_h=H, upsample_w=W,
                                       train_bn=True, compute_dtype=cdt)
        return (jnp.sum(feats[0].astype(jnp.float32))
                + jnp.sum(feats[1].astype(jnp.float32)) + jnp.sum(pose))

    ms = timeit(lambda: out.__setitem__("v", df_fwd(params, state, x2b)),
                lambda: out["v"], a.steps)
    print(f"dfnet fwd (features+pose) 2B={2*b}: {ms:.1f} ms", flush=True)

    # ---- finer decomposition of the adapt→upsample→triplet block ------
    from dfnet_tpu.models.dfnet import _adapt_level
    from dfnet_tpu.ops.resize import resize_bilinear_align_corners
    from dfnet_tpu.training.feature_losses import (
        triplet_loss_hard_negative_mining)

    # synthetic taps at the real VGG tap shapes/channels
    tap_shapes = {"conv1_2": (H, W, 64), "conv3_3": (H // 4, W // 4, 256),
                  "conv5_3": (H // 16, W // 16, 512)}
    key = jax.random.PRNGKey(0)
    for i, name in enumerate(mcfg.hypercolumn_layers):
        th, tw, tc = tap_shapes[name]
        tap = jax.random.normal(key, (2 * b, th, tw, tc), cdt)

        @jax.jit
        def adapt_fwdbwd(p, s, tap, i=str(i)):
            def f(p):
                y, _ = _adapt_level(p["adapt"][i], s["adapt"][i], tap, True)
                return jnp.sum(y.astype(jnp.float32))
            return jax.tree.leaves(jax.grad(f)(p))[0].ravel()[0]

        ms = timeit(lambda: out.__setitem__("v", adapt_fwdbwd(params, state,
                                                              tap)),
                    lambda: out["v"], a.steps)
        print(f"adapt[{name}] {th}x{tw}x{tc} fwd+bwd: {ms:.1f} ms",
              flush=True)

        @jax.jit
        def ups_fwdbwd(x):
            def f(x):
                return jnp.sum(resize_bilinear_align_corners(x, H, W)
                               .astype(jnp.float32))
            return jax.grad(f)(x).ravel()[0]

        amap = jax.random.normal(key, (2 * b, th, tw, mcfg.output_dim), cdt)
        ms = timeit(lambda: out.__setitem__("v", ups_fwdbwd(amap)),
                    lambda: out["v"], a.steps)
        print(f"upsample[{name}] {th}x{tw}->{H}x{W} fwd+bwd: {ms:.1f} ms",
              flush=True)

    L = len(mcfg.hypercolumn_layers)
    f1 = jax.random.normal(key, (L, b, H, W, mcfg.output_dim), cdt)
    f2 = f1 + 0.01

    @jax.jit
    def trip_fwdbwd(f1, f2):
        def f(f2):
            return triplet_loss_hard_negative_mining(f1, f2)
        return jax.grad(f)(f2).ravel()[0]

    ms = timeit(lambda: out.__setitem__("v", trip_fwdbwd(f1, f2)),
                lambda: out["v"], a.steps)
    print(f"triplet(hard-neg) L={L} B={b} {H}x{W}x{mcfg.output_dim} "
          f"fwd+bwd: {ms:.1f} ms", flush=True)

    print("\nderived:", flush=True)
    full, norvs = results["full (triplet+RVS)"], results["no RVS (triplet)"]
    pose_only = results["pose-only"]
    print(f"  RVS branch (fwd+bwd {b} imgs): {full - norvs:.1f} ms")
    print(f"  adapt+upsample+triplet (fwd+bwd): {norvs - pose_only:.1f} ms")
    print(f"  siamese encoder+pose head fwd+bwd+adam: {pose_only:.1f} ms")


if __name__ == "__main__":
    main()
