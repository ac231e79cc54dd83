#!/usr/bin/env python
"""int8 re-probe at W=256: marginal per-layer MLP cost inside a Pallas
kernel, int8 (shift-requant) vs bf16.

Round-3 closed int8 at W=128: the requant VPU ops erased the MXU's 2x
int8 rate (0.333 vs 0.309 ms/layer per 2M pts). The dead-end note
conditions on width — at W=256 the matmul work quadruples while the
requant (a (W, T) elementwise pass) only doubles, so the balance could
flip. This measures exactly that, the same way: time a D-layer kernel
at two depths; the difference isolates the per-layer marginal.

Reference anchor: the W x W trunk matmuls of nerfw.py:220-354 at
netwidth 256 (the width frontier QUALITY.md round 4 measured +1-1.5 dB
on); int8 would be a test-time (post-training-quantization) render
path, like ops/nerf_kernels.py's bf16 fine sweep.

Usage: python scripts/bench_int8_wide.py [--width 256] [--points 2097152]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_bf16(D, x_ref, *refs):
    ws = [r[...] for r in refs[:D]]
    out_ref = refs[D]
    h = x_ref[...]
    for w in ws:
        y = jax.lax.dot_general(w, h, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
    out_ref[...] = h[:8].astype(jnp.float32)


def _kernel_int8(D, x_ref, *refs):
    ws = [r[...] for r in refs[:D]]
    out_ref = refs[D]
    h = x_ref[...]
    for w in ws:
        y = jax.lax.dot_general(w, h, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # cheapest shift-requant + relu: one shift, one clip, one cast
        h = jnp.clip(y >> 7, 0, 127).astype(jnp.int8)
    out_ref[...] = h[:8].astype(jnp.float32)


def build(D, W, T, G, dtype):
    kern = _kernel_int8 if dtype == jnp.int8 else _kernel_bf16
    fn = pl.pallas_call(
        functools.partial(kern, D),
        grid=(G,),
        in_specs=[pl.BlockSpec((W, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * D,
        out_specs=pl.BlockSpec((8, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, G * T), jnp.float32),
    )
    return jax.jit(fn)


def main():
    argv = sys.argv
    arg = lambda f, d: int(argv[argv.index(f) + 1]) if f in argv else d
    W = arg("--width", 256)
    P = arg("--points", 2 * 1024 * 1024)
    T = 512 if W > 128 else 1024      # VMEM: D weight mats + activations
    G = P // T
    key = jax.random.PRNGKey(0)

    results = {}
    for name, dtype in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        times = {}
        for D in (2, 6):
            if dtype == jnp.int8:
                x = jax.random.randint(key, (W, G * T), 0, 64, jnp.int32
                                       ).astype(jnp.int8)
                ws = [jax.random.randint(jax.random.fold_in(key, i),
                                         (W, W), -4, 4, jnp.int32
                                         ).astype(jnp.int8)
                      for i in range(D)]
            else:
                x = (jax.random.uniform(key, (W, G * T)) * 0.5
                     ).astype(jnp.bfloat16)
                ws = [(jax.random.normal(jax.random.fold_in(key, i),
                                         (W, W)) * (1.0 / W ** 0.5)
                       ).astype(jnp.bfloat16)
                      for i in range(D)]
            fn = build(D, W, T, G, dtype)
            s = float(jnp.sum(fn(x, *ws)))          # compile + sync
            reps = 8
            t0 = time.time()
            acc = 0.0
            for _ in range(reps):
                acc += float(jnp.sum(fn(x, *ws)))   # scalar fetch syncs
            dt = (time.time() - t0) / reps * 1e3
            times[D] = dt
            print(f"{name} W={W} D={D}: {dt:.3f} ms  (check {s:.3e})",
                  flush=True)
        marg = (times[6] - times[2]) / 4.0
        results[name] = marg
        tflops = 2 * W * W * P / (marg * 1e-3) / 1e12
        print(f"{name} W={W}: marginal {marg:.4f} ms/layer per {P} pts "
              f"({tflops:.0f} T{'OP' if name == 'int8' else 'FLOP'}S)",
              flush=True)
    print(f"int8/bf16 marginal ratio: "
          f"{results['int8'] / results['bf16']:.3f} "
          f"({'int8 WINS' if results['int8'] < results['bf16'] else 'bf16 wins'})",
          flush=True)


if __name__ == "__main__":
    main()
