"""Raw Mosaic matmul throughput at the Swin stage shapes.

One pallas kernel per shape: grid of S steps, each step does the 4
block matmuls (qkv, proj, fc1, fc2) on a (R, C) bf16 block with f32
accumulation — no LN/attend/GELU/conversions beyond the one astype
after each accumulate.  Reports achieved TFLOP/s per shape.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = int(os.environ.get("ITERS", "50"))


def kernel(x_ref, wqkv_ref, wproj_ref, w1_ref, w2_ref, o_ref):
    dt = x_ref.dtype
    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    x = x_ref[:]
    qkv = dot(x, wqkv_ref[:]).astype(dt)
    C = x.shape[1]
    ctx = qkv[:, :C]
    a = dot(ctx, wproj_ref[:]).astype(dt)
    h = dot(a, w1_ref[:]).astype(dt)
    o = dot(h, w2_ref[:]).astype(dt)
    o_ref[:] = o


def bench(R, C, S):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(R * S, C)) * .02,
                    jnp.bfloat16)
    wqkv = jnp.zeros((C, 3 * C), jnp.bfloat16)
    wproj = jnp.zeros((C, C), jnp.bfloat16)
    w1 = jnp.zeros((C, 4 * C), jnp.bfloat16)
    w2 = jnp.zeros((4 * C, C), jnp.bfloat16)

    spec = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspec = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel, grid=(S,),
        in_specs=[spec, cspec(wqkv.shape), cspec(wproj.shape),
                  cspec(w1.shape), cspec(w2.shape)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((R * S, C), jnp.bfloat16),
    )

    def loop(x):
        def body(c, _):
            y = f(x * (1 + c * 1e-12).astype(x.dtype), wqkv, wproj, w1, w2)
            s = y[::257, ::97].astype(jnp.float32).sum()
            return c + s * 1e-12, s
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()

    j = jax.jit(loop)
    float(jax.device_get(j(x)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.device_get(j(x)))
        best = min(best, time.perf_counter() - t0)
    dt_ms = best / ITERS * 1e3
    flops = 2 * R * S * (C * 3 * C + C * C + C * 4 * C + 4 * C * C)
    print(f"R={R:5d} C={C:4d} S={S:3d}: {dt_ms:7.3f} ms  "
          f"{flops / (dt_ms * 1e-3) / 1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    # stage 1: G=8 merged windows x 98 rows, C=96, 128 grid steps
    bench(784, 96, 128)
    # stage 1 with G=16
    bench(1568, 96, 64)
    # stage 2: C=192
    bench(784, 192, 32)
    # stage 3: C=384, G=4
    bench(392, 384, 16)
    # stage 3 with fatter blocks
    bench(784, 384, 8)
    # stage-4-like C=768 reference point
    bench(392, 768, 4)
