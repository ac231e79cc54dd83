#!/usr/bin/env python
"""Benchmark: NeRF-H test-time rendering throughput (rays/sec/chip).

Model/workload matches the reference's measured configuration
(BASELINE.md): MLP D=8 / W=128, 64-sample placement sweep + culled fine
render, histogram-conditioned appearance/transient embeddings. The
render path is the production default: fused transposed Pallas kernels
with proposal placement and CDF-quantile empty-space culling /
early-ray-termination (24 fine samples concentrated in the per-ray
informative interval) + in-kernel compositing — validated at parity
with the reference schedule (within 0.04 dB on the 301-epoch synthetic
run; QUALITY.md round-3 table).

The model is the TRAINED 301-epoch synthetic checkpoint
(assets/nerfh_synthetic_301.npz, regenerate with
scripts/quality_synthetic.py) and rays come from real validation
cameras, so culling/termination rates reflect a trained density field —
random-init numbers would be fiction. Variants: --exact (reference
exact-union schedule, no culling), --xla_path (pure-XLA reference
path), --fp32.

Timing note: on this platform `block_until_ready()` does not
synchronize through the device relay, so each timed call reduces the
rendered image to a scalar checksum and fetches it to host — a true
synchronization with a 4-byte transfer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp


BASELINE_RAYS_PER_SEC = 5.0e6
# Large per-call ray count: the relay in this environment adds a fixed
# ~20-40 ms latency to every synchronized device call; 1M rays (~3.4
# full 480x640 frames, the render_path/video regime) amortizes it so the
# metric reflects device throughput, not harness latency. The marginal
# per-chunk rate was verified flat from 16 to 64 chunks/call.
N_RAYS_PER_CALL = 1 << 20
CHUNK = 1 << 14
CKPT = osp.join(osp.dirname(osp.abspath(__file__)),
                "assets", "nerfh_synthetic_301.npz")
CULL_Q = 2e-3
N_FINE = 24
N_PLACE = 32


def _arm_watchdog():
    """The device relay in this environment can wedge (jax.devices()
    blocks forever, Aug-17 outage). A hung bench is worse than a failed
    one for the driver — hard-exit with a diagnostic instead."""
    import os
    import threading

    limit = float(os.environ.get("BENCH_WATCHDOG_S", "3000"))

    def boom():
        print(f"[bench] WATCHDOG: no result after {limit:.0f}s — device "
              "backend likely wedged (relay outage); aborting", file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)

    t = threading.Timer(limit, boom)
    t.daemon = True
    t.start()
    return t


def main():
    import numpy as np

    watchdog = _arm_watchdog()

    from dfnet_tpu.config import parse_args
    from dfnet_tpu.data.synthetic import make_synthetic_scene
    from dfnet_tpu.models.factory import create_nerfh, render_settings
    from dfnet_tpu.render.fast import FastNeRFH, render_rays_fast
    from dfnet_tpu.render.rays import get_rays
    from dfnet_tpu.render.volume import render_rays
    from dfnet_tpu.training.checkpoints import load_pytree

    precision = "fp32" if "--fp32" in sys.argv else "bf16"
    use_xla = "--xla_path" in sys.argv  # reference XLA path (no Pallas kernels)
    exact = "--exact" in sys.argv       # reference exact-union schedule

    def arg_of(flag, default):
        if flag not in sys.argv:
            return default
        i = sys.argv.index(flag)
        if i + 1 >= len(sys.argv):
            raise SystemExit(f"{flag} requires a value")
        return sys.argv[i + 1]

    chunk_override = arg_of("--chunk", None)
    if chunk_override is not None:
        chunk_override = int(chunk_override)
        if chunk_override <= 0:
            raise SystemExit("--chunk must be positive")
    # width/ckpt overrides for frontier probes (e.g. a W=256 model
    # trained+saved via scripts/quality_synthetic.py --save_ckpt)
    netw = arg_of("--netwidth", "128")
    netwf = arg_of("--netwidth_fine", "128")
    ckpt_path = arg_of("--ckpt", CKPT)
    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--precision", precision, "--netwidth", netw,
        "--netwidth_fine", netwf,
    ], stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    scene = make_synthetic_scene(n_train=24, n_val=6, H=48, W=64,
                                 focal=60.0, seed=0, appearance_jitter=0.1)
    trained = osp.exists(ckpt_path)
    if trained:
        loaded, _ = load_pytree(ckpt_path)
        # shape-check vs the configured model NOW: a --ckpt saved at a
        # different width otherwise only fails later, deep inside jit
        init_shapes = jax.tree.map(lambda a: a.shape, params)
        got_shapes = jax.tree.map(lambda a: a.shape, loaded)
        if init_shapes != got_shapes:
            raise SystemExit(
                f"checkpoint {ckpt_path} does not match the model built "
                f"from --netwidth {netw} / --netwidth_fine {netwf} "
                "(param shape mismatch) — pass matching width flags")
        params = jax.tree.map(jnp.asarray, loaded)
    else:
        print("[bench] WARNING: trained checkpoint missing — random init; "
              "culled-path throughput is not meaningful", file=sys.stderr)
    settings = render_settings(cfg, scene.near, scene.far, test=True)
    fast = None if use_xla else FastNeRFH.pack(params, model)

    render_kw = {}
    if not use_xla and not exact:
        # schedule knobs overridable for frontier probes (W=256 tuning)
        render_kw = dict(cull_q=float(arg_of("--cull_q", CULL_Q)),
                         n_fine=int(arg_of("--n_fine", N_FINE)),
                         n_place=int(arg_of("--n_place", N_PLACE)),
                         fuse_composite=True)

    n = N_RAYS_PER_CALL
    chunk = CHUNK if chunk_override is None else chunk_override
    if fast is not None:
        align = fast.ray_align(settings, render_kw.get("n_fine"),
                               render_kw.get("n_place"))
        chunk = max(chunk // align, 1) * align
        n = (n // chunk) * chunk
    n_chunks = n // chunk
    # (1, HB) uniform-hist row on the fast path (gather-once); per-ray
    # rows for the XLA path
    hist = jnp.zeros((1 if fast is not None else chunk, cfg.hist_bin),
                     jnp.int32)

    @jax.jit
    def render_checksum(params, rays_o, rays_d, jitter):
        rays_o = rays_o + jitter  # traced arg: distinct work per call, no recompile
        def body(args):
            o, d = args
            if fast is not None:
                r = render_rays_fast(fast, o, d, hist, settings,
                                     interpret=False, **render_kw)
            else:
                r = render_rays(params, model, o, d, hist, settings)
            return jnp.sum(r["rgb"])
        return jnp.sum(jax.lax.map(
            body, (rays_o.reshape(n_chunks, chunk, 3),
                   rays_d.reshape(n_chunks, chunk, 3))))

    # rays from the real validation cameras (trained-density workload)
    ro_l, rd_l = [], []
    for i in range(len(scene.val)):
        o, d = get_rays(scene.H, scene.W, scene.focal,
                        jnp.asarray(scene.val.poses[i]))
        ro_l.append(o.reshape(-1, 3))
        rd_l.append(d.reshape(-1, 3))
    rays_o = jnp.concatenate(ro_l)
    rays_d = jnp.concatenate(rd_l)
    reps = -(-n // rays_o.shape[0])
    rays_o = jnp.tile(rays_o, (reps, 1))[:n]
    rays_d = jnp.tile(rays_d, (reps, 1))[:n]

    # ---- secondary metric: stage-1 training throughput (fwd+bwd+Adam,
    # reference workload shape: N_rand=1536, 64+64 samples) so grad-path
    # regressions are caught too. Uses the fused custom-VJP train step.
    def bench_train_steps(**overrides):
        from dfnet_tpu.training.nerf_trainer import NeRFTrainer

        tcfg = cfg.replace(N_rand=1536, **overrides)
        tscene = make_synthetic_scene(n_train=32, n_val=1, H=48, W=64,
                                      focal=60.0, seed=0)
        trainer = NeRFTrainer(tcfg, tscene)
        trainer.train_epoch(0)  # compile + warm (one dispatch per epoch)
        best = 0.0
        for _ in range(3):
            epochs = 2
            t0 = time.perf_counter()
            for e in range(epochs):
                trainer.train_epoch(e + 1)   # syncs once per epoch
            dt = time.perf_counter() - t0
            best = max(best, epochs * len(tscene.train) / dt)
        return best

    # "train_steps_per_sec" KEEPS its original meaning — the reference
    # fixed-epoch 64+64 schedule — so the key stays comparable across
    # every BENCH_r*.json. The production culled schedule (per-ray
    # interval restriction, q=2e-3 nf=32; equal-wall-clock convergence
    # parity in QUALITY.md round 4) reports under its own key.
    train_steps_per_sec = bench_train_steps()
    train_culled_steps_per_sec = bench_train_steps(
        train_cull_q=2e-3, train_fine_total=32, train_cull_warmup=0)

    float(render_checksum(params, rays_o, rays_d, 0.0))  # compile + warm

    # the shared-TPU relay throughput fluctuates run to run; take the
    # best of several repeats as the machine capability
    best = 0.0
    for rep in range(3):
        iters = 6
        t0 = time.perf_counter()
        for i in range(iters):
            checksum = float(render_checksum(params, rays_o, rays_d,
                                             (rep * iters + i) * 1e-6))
            # the float() above already syncs, so validating every timed
            # call is free — a NaN in ANY iteration voids the number
            assert checksum == checksum, "render produced NaN"
        dt = time.perf_counter() - t0
        best = max(best, n * iters / dt)
    rays_per_sec = best
    watchdog.cancel()

    # ---- stage-2/3 step times (VERDICT r4 item 8): run the dedicated
    # microbenches as HARD-TIMEOUT subprocesses so a cold compile or a
    # wedged relay can only null these keys, never void the render
    # numbers above. With warm AOT (~/.cache/dfnet_tpu/aot) + XLA caches
    # each takes ~1-3 min; cold compiles exceed the timeout → null.
    def bench_sub(args, pattern, timeout_s):
        import re
        import subprocess

        try:
            r = subprocess.run(
                [sys.executable] + args, capture_output=True, text=True,
                timeout=timeout_s, cwd=osp.dirname(osp.abspath(__file__)))
            m = re.search(pattern, r.stdout + r.stderr)
            return round(float(m.group(1)), 2) if m else None
        except Exception:
            return None

    import os

    sub_t = float(os.environ.get("BENCH_STAGE_TIMEOUT_S", "1500"))
    stage2_ms = bench_sub(["scripts/bench_stage2.py", "--rvs"],
                          r"([\d.]+) ms/step", sub_t)
    stage3_ms = bench_sub(["scripts/bench_stage3.py"],
                          r"([\d.]+) ms/image", sub_t)

    print(json.dumps({
        "metric": "nerf_render_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
        "train_steps_per_sec": round(train_steps_per_sec, 1),
        "train_steps_per_sec_culled": round(train_culled_steps_per_sec, 1),
        "stage2_ms_per_step": stage2_ms,     # B=4 240x427 bf16 +RVS
        "stage3_ms_per_image": stage3_ms,    # 240x427 bf16, render @/4
        "trained_ckpt": trained,
        "render_path": ("xla" if use_xla else
                        "fast_exact" if exact else
                        f"fast_cull_nf{N_FINE}_p{N_PLACE}_q{CULL_Q}_fused"),
    }))


if __name__ == "__main__":
    main()
