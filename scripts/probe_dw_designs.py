"""Designed alternatives for the dw (weight-grad) matmul archetype
(VERDICT r4 item 1): the round-4 roofline measured dw = (C,M)@(M,4C)
at ~70 TF/s (1/3 peak) at every stage width via the chunked-accumulator
kernel.  Before accepting that as the shape's admission, measure:

  A. XLA's own dw formulation (x^T @ dy via dot_general contract-dim-0)
  B. Pallas with (M, C) operand layout (contract over sublanes, no
     materialized transpose)
  C. Transposed output dw^T = dy^T @ x  ((4C,M)@(M,C))
  D. Separate per-chunk output slices (no accumulator RMW) + XLA reduce
  E. Chunk-count sweep (contraction split granularity)
  F. Output-tile grid (split the (C,4C) output over lanes, stream full M
     per tile — the weight-stationary-friendly mapping)

Usage: python scripts/probe_dw_designs.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

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


FLOOR = None


def timeit(fn, *args):
    global FLOOR
    if FLOOR is None:
        FLOOR = measure_floor()

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


def report(tag, t_ms, C, N):
    fl = 2 * C * M * N
    print(f"{tag:38s}: {t_ms:7.3f} ms  {fl / (t_ms * 1e-3) / 1e12:6.1f} TF/s",
          flush=True)


# ---- A. XLA dw (both layouts) ------------------------------------------

def xla_dw_contract0(x, dy):
    # x (M, C), dy (M, 4C): dw = contract over dim 0 (the layout the real
    # backward has in registers — no materialized transpose)
    dw = jax.lax.dot_general(x, dy, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dw[::7, ::13].sum()


def xla_dw_pretransposed(xT, dy):
    dw = jax.lax.dot_general(xT, dy, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dw[::7, ::13].sum()


# ---- B. Pallas contract-dim-0 (sublane contraction) --------------------

def pallas_dw_sublane(C, N, chunks):
    Mc = M // chunks

    def kern(x_ref, dy_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jax.lax.dot_general(
            x_ref[:], dy_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        kern, grid=(chunks,),
        in_specs=[pl.BlockSpec((Mc, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Mc, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.float32),
    )

    def run(x, dy):
        return f(x, dy)[::7, ::13].sum()
    return run


# ---- D. separate output slices, reduce outside -------------------------

def pallas_dw_slices(C, N, chunks):
    Mc = M // chunks

    def kern(x_ref, dy_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], dy_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None]

    f = pl.pallas_call(
        kern, grid=(chunks,),
        in_specs=[pl.BlockSpec((Mc, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Mc, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((chunks, C, N), jnp.float32),
    )

    def run(x, dy):
        return f(x, dy).sum(0)[::7, ::13].sum()
    return run


# ---- F. output-tile grid, full-M stream per tile -----------------------

def pallas_dw_outtiles(C, N, tile_n):
    nt = N // tile_n

    def kern(x_ref, dy_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], dy_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        kern, grid=(nt,),
        in_specs=[pl.BlockSpec((M, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((M, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.float32),
    )

    def run(x, dy):
        return f(x, dy)[::7, ::13].sum()
    return run


# ---- G. out-tile x M-chunk grid, scratch f32 accumulator ---------------

def pallas_dw_outtile_mchunk(C, N, tile_n, chunks):
    nt = N // tile_n
    Mc = M // chunks

    def kern(x_ref, dy_ref, o_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], dy_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == chunks - 1)
        def _():
            o_ref[:] = acc_ref[:]

    f = pl.pallas_call(
        kern, grid=(nt, chunks),
        in_specs=[pl.BlockSpec((Mc, C), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Mc, tile_n), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, tile_n), jnp.float32)],
    )

    def run(x, dy):
        return f(x, dy)[::7, ::13].sum()
    return run


def main():
    rng = np.random.default_rng(0)
    for C in (96, 192, 384, 768):
        N = 4 * C
        x = jnp.asarray(rng.normal(size=(M, C)) * .02, jnp.bfloat16)
        xT = jnp.asarray(np.asarray(x).T.copy(), jnp.bfloat16)
        dy = jnp.asarray(rng.normal(size=(M, N)) * .02, jnp.bfloat16)
        print(f"--- C={C} (N={N}, M={M}) ---", flush=True)
        report("A xla contract-dim0", timeit(xla_dw_contract0, x, dy), C, N)
        report("A xla pre-transposed", timeit(xla_dw_pretransposed, xT, dy),
               C, N)
        for ch in (4, 7, 14):
            try:
                report(f"B pallas sublane c{ch}",
                       timeit(pallas_dw_sublane(C, N, ch), x, dy), C, N)
            except Exception as e:
                print(f"B c{ch}: {type(e).__name__}", flush=True)
        for ch in (7, 14):
            try:
                report(f"D pallas slices c{ch}",
                       timeit(pallas_dw_slices(C, N, ch), x, dy), C, N)
            except Exception as e:
                print(f"D c{ch}: {type(e).__name__}", flush=True)
        # C: transposed output — reuse sublane form with swapped operands
        try:
            report("C pallas dw^T c7",
                   timeit(pallas_dw_sublane(N, C, 7), dy, x), N, C)
        except Exception as e:
            print(f"C: {type(e).__name__}", flush=True)
        # F is VMEM-feasible up to C=384 (x resident 4.6MB + dy tile);
        # at C=768 x alone is 9.2MB, so stream both via G instead.
        if C <= 384:
            for tn in (256, 512):
                try:
                    report(f"F pallas outtile n{tn}",
                           timeit(pallas_dw_outtiles(C, N, tn), x, dy), C, N)
                except Exception as e:
                    print(f"F n{tn}: {type(e).__name__}", flush=True)
        for tn, ch in ((256, 7), (256, 14), (512, 7), (N, 7), (N, 14)):
            if tn > N:
                continue
            try:
                report(f"G outtile n{tn} c{ch}",
                       timeit(pallas_dw_outtile_mchunk(C, N, tn, ch),
                              x, dy), C, N)
            except Exception as e:
                print(f"G n{tn} c{ch}: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
