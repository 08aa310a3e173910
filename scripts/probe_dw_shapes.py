"""Raw Mosaic throughput for the three matmul archetypes per stage width:

  fwd : (M, C) @ (C, 4C)      — activations x weights
  dx  : (M, 4C) @ (4C, C)     — cotangent x weight^T
  dw  : (C, M) @ (M, 4C)      — weight grad (contraction over rows)

The dw archetype has a tiny (C, 4C) output and a huge contraction —
the suspected narrow-C killer in the Swin stage-1/2 backwards.
Floor-subtracted (single kernel per line, ITERS chained in-grid).
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

ITERS = int(os.environ.get("ITERS", "100"))
M = 6272


def measure_floor():
    j = jax.jit(lambda x: (x * 1.000001).sum())
    x = jnp.zeros((8, 128), jnp.float32)
    float(jax.device_get(j(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(j(x)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


FLOOR = measure_floor()


def timeit(fn, *args):
    def loop(*a):
        def body(c, _):
            a2 = tuple(t * (1 + c * 1e-12).astype(t.dtype) for t in a)
            v = fn(*a2)
            return c + v * 1e-12, v
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(*args)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.device_get(j(*args)))
        best = min(best, time.perf_counter() - t0)
    return (best - FLOOR) / ITERS * 1e3


def pallas_mm(A, B, gsplit):
    """One pallas kernel computing A @ B, grid over A's rows in gsplit
    chunks (mirrors how the block kernels slice rows)."""
    Ma, K = A.shape
    _, N = B.shape

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    f = pl.pallas_call(
        kern, grid=(gsplit,),
        in_specs=[pl.BlockSpec((Ma // gsplit, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Ma // gsplit, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ma, N), jnp.bfloat16),
    )

    def run(a, b):
        y = f(a, b)
        return y[::113, ::97].astype(jnp.float32).sum()
    return run


def pallas_dw(C, Mtot, N, chunks):
    """dw = A(C, M) @ B(M, N) with the contraction gridded into chunks and
    a revisited f32 VMEM accumulator (the stored-backward pattern)."""
    Mc = Mtot // chunks

    def kern(a_ref, b_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        kern, grid=(chunks,),
        in_specs=[pl.BlockSpec((C, Mc), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Mc, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.float32),
    )

    def run(a, b):
        y = f(a, b)
        return y[::7, ::13].sum()
    return run


def dw_line(tag, C, N, chunks):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(C, M)) * .02, jnp.bfloat16)
    B = jnp.asarray(rng.normal(size=(M, N)) * .02, jnp.bfloat16)
    t = timeit(pallas_dw(C, M, N, chunks), A, B)
    fl = 2 * C * M * N
    print(f"{tag:26s} ({C:5d},{M:5d})@({M:5d},{N:5d}) c{chunks:3d}: "
          f"{t:7.3f} ms  {fl / (t * 1e-3) / 1e12:6.1f} TF/s", flush=True)


def line(tag, Ma, K, N, gsplit):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(Ma, K)) * .02, jnp.bfloat16)
    B = jnp.asarray(rng.normal(size=(K, N)) * .02, jnp.bfloat16)
    t = timeit(pallas_mm(A, B, gsplit), A, B)
    fl = 2 * Ma * K * N
    print(f"{tag:26s} ({Ma:5d},{K:5d})@({K:5d},{N:5d}) g{gsplit:3d}: "
          f"{t:7.3f} ms  {fl / (t * 1e-3) / 1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    for C, nm in ((96, "S1"), (192, "S2"), (384, "S3"), (768, "S4/fusion")):
        g = max(1, M // (8 * 98))          # ~784-row blocks
        line(f"{nm} fwd", M, C, 4 * C, g)
        line(f"{nm} dx", M, 4 * C, C, g)
        dw_line(f"{nm} dw c7", C, 4 * C, 7)
        dw_line(f"{nm} dw c1", C, 4 * C, 1) if C <= 192 else None
        line(f"{nm} dx pad128", M, 4 * C, ((C + 127) // 128) * 128, g)
