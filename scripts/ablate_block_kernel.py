"""Ablation timing of the fused Swin whole-block kernel on the real chip.

Replaces pieces of the kernel body (GELU, softmax, attention dots, MLP
dots) with cheap stand-ins to attribute time between MXU and VPU work.
Numerically wrong on purpose — timing only.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.ops.pallas_attn import _erf_approx, _ln

ITERS = 50


def make_kernel(mode: str, scale, num_heads, window_n):
    def kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
               bproj_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
               b2_ref, bias_ref, o_ref, ctx_ref):
        GN, C = x_ref.shape
        N = window_n
        G = GN // N
        Gb = bias_ref.shape[0]
        Dh = C // num_heads

        def dot(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        X = x_ref[:].astype(jnp.float32)
        if mode == "no_ln":
            H1 = X
        else:
            H1 = _ln(X, ln1s_ref[:], ln1b_ref[:])
        QKV = dot(H1.astype(x_ref.dtype), wqkv_ref[:])
        QKV = (QKV + bqkv_ref[:].astype(jnp.float32)).astype(x_ref.dtype)

        if mode == "no_attn":
            ctx_ref[:] = QKV[:, 2 * C:3 * C]
        else:
            for g in range(G):
                rows = QKV[g * N:(g + 1) * N]
                for hh in range(num_heads):
                    q = rows[:, hh * Dh:(hh + 1) * Dh].astype(
                        jnp.float32) * scale
                    k = rows[:, C + hh * Dh:C + (hh + 1) * Dh].astype(
                        jnp.float32)
                    v = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
                    s = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = s + bias_ref[g % Gb, hh]
                    if mode == "no_softmax":
                        p = s * 0.001
                    else:
                        s = s - jnp.max(s, axis=-1, keepdims=True)
                        p = jnp.exp(s)
                        p = p / jnp.sum(p, axis=-1, keepdims=True)
                    ctx = jax.lax.dot_general(
                        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    ctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh] = \
                        ctx.astype(ctx_ref.dtype)

        attn = dot(ctx_ref[:], wproj_ref[:])
        res1 = X + attn + bproj_ref[:].astype(jnp.float32)
        if mode == "no_ln":
            H2 = res1
        else:
            H2 = _ln(res1, ln2s_ref[:], ln2b_ref[:])
        if mode == "no_mlp":
            o_ref[:] = res1.astype(o_ref.dtype)
            return
        m = dot(H2.astype(x_ref.dtype), w1_ref[:])
        m = m + b1_ref[:].astype(jnp.float32)
        if mode == "no_gelu":
            m = m * 0.5
        elif mode == "gelu_bf16":
            mb = m.astype(jnp.bfloat16)
            mb = 0.5 * mb * (1.0 + _erf_approx(mb * 0.70710678))
            m = mb.astype(jnp.float32)
        else:
            m = 0.5 * m * (1.0 + _erf_approx(m * 0.7071067811865476))
        mlp = dot(m.astype(x_ref.dtype), w2_ref[:])
        o_ref[:] = (res1 + mlp
                    + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)

    return kernel


def run(mode, B=64, HW=14, C=384, nH=12, N=49, G=16, dtype=jnp.bfloat16):
    nW = (HW // 7) ** 2
    BW = B * nW
    scale = (C // nH) ** -0.5
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.normal(size=(BW * N, C)) * 0.02, dtype)
    params = dict(
        ln1s=jnp.ones((C,), jnp.float32), ln1b=jnp.zeros((C,), jnp.float32),
        wqkv=jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.02, dtype),
        bqkv=jnp.zeros((3 * C,), dtype),
        wproj=jnp.asarray(rng.normal(size=(C, C)) * 0.02, dtype),
        bproj=jnp.zeros((C,), dtype),
        ln2s=jnp.ones((C,), jnp.float32), ln2b=jnp.zeros((C,), jnp.float32),
        w1=jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.02, dtype),
        b1=jnp.zeros((4 * C,), dtype),
        w2=jnp.asarray(rng.normal(size=(4 * C, C)) * 0.02, dtype),
        b2=jnp.zeros((C,), dtype),
    )
    bias = jnp.zeros((1, nH, N, N), jnp.float32)

    kern = make_kernel(mode, scale, nH, N)
    grid = (BW // G,)
    x_spec = pl.BlockSpec((G * N, C), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    plist = [params[k] for k in ("ln1s", "ln1b", "wqkv", "bqkv", "wproj",
                                 "bproj", "ln2s", "ln2b", "w1", "b1", "w2",
                                 "b2")]

    def call(x):
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[x_spec] + [const_spec(p.shape) for p in plist]
            + [const_spec(bias.shape)],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[pltpu.VMEM((G * N, C), x.dtype)],
        )(x, *plist, bias)

    def loop(x):
        def body(x, _):
            out = call(x)
            return out * 0.5 + x * 0.5, out.mean()
        _, means = jax.lax.scan(body, x, None, length=ITERS)
        return means.sum()

    jloop = jax.jit(loop)
    float(jax.device_get(jloop(x)))
    t0 = time.perf_counter()
    float(jax.device_get(jloop(x)))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{mode:12s}: {dt*1e3:7.3f} ms/block")
    return dt


if __name__ == "__main__":
    modes = sys.argv[1:] or ["full", "no_gelu", "gelu_bf16", "no_softmax",
                             "no_attn", "no_mlp", "no_ln"]
    for m in modes:
        run(m)
