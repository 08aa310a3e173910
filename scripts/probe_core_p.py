"""Prototype: attention-core backward consuming a STORED softmax matrix
(bf16 p from the forward) instead of recomputing QK^T+exp in pass 1.

Hypothesis: the core backward is compute-floor-bound at ~530 ns per
(window-pair, head) unit, of which the pass-1 recompute (one matmul +
the exp/reciprocal VPU chain) is a large share. Storing p in the
save-res forward trades ~2x p HBM traffic for that compute.

Variants at Swin stage geometry (b32):
  base   — current _core_bwd_kernel2d (recompute)
  storep — p ships as a bf16 input; pass 1 shrinks to dp = dctx V^T
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

import mvlt_tpu.ops.pallas_attn as pa

ITERS = 50
B = 32


def measure_floor():
    x = jnp.ones((8, 128), jnp.bfloat16)

    def loop(x):
        def body(c, _):
            o = c * 2.0
            return o, o.reshape(-1)[0]
        _, m = jax.lax.scan(body, x, None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(x)))
    t0 = time.perf_counter()
    float(jax.device_get(j(x)))
    return time.perf_counter() - t0


def timeit(fn, floor, *args):
    def loop(*args):
        def body(c, _):
            a2 = tuple(a * (1 + c * 1e-12).astype(a.dtype) for a in args)
            v = fn(*a2)
            return c + v * 1e-12, v
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(*args)))
    t0 = time.perf_counter()
    float(jax.device_get(j(*args)))
    return ((time.perf_counter() - t0) - floor) / ITERS * 1e3


def _storep_kernel(p_ref, qkv_ref, dctx_ref, dqkv_ref, dbias_ref, dp_ref,
                   *, seq_n: int, scale: float, num_heads: int):
    GN, C3 = qkv_ref.shape
    N = seq_n
    G = GN // N
    C = C3 // 3
    Gb = dbias_ref.shape[0]
    Dh = C // num_heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    ones = jnp.ones((N, 1), jnp.float32)
    base = pl.program_id(0) * G
    dt = qkv_ref.dtype
    for g in range(G):
        rows = qkv_ref[g * N:(g + 1) * N]
        for hh in range(num_heads):
            vd = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            dctx_d = dctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh]
            dp = jax.lax.dot_general(dctx_d, vd, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp_ref[g * num_heads + hh] = dp
    for g in range(G):
        rows = qkv_ref[g * N:(g + 1) * N]
        for hh in range(num_heads):
            qd = rows[:, hh * Dh:(hh + 1) * Dh]
            kd = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            dctx_d = dctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh]
            pd = p_ref[g * num_heads + hh]           # bf16 stored softmax
            p = pd.astype(jnp.float32)
            dp = dp_ref[g * num_heads + hh]
            dv = jax.lax.dot_general(pd, dctx_d, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            pdp = p * dp
            rd = jax.lax.dot_general(pdp, ones, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = pdp - p * rd
            dsd = ds.astype(dt)
            dq = jax.lax.dot_general(dsd, kd, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(dsd, qd, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            sl = slice(g * N, (g + 1) * N)
            dqkv_ref[sl, hh * Dh:(hh + 1) * Dh] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[sl, C + hh * Dh:C + (hh + 1) * Dh] = \
                dk.astype(dqkv_ref.dtype)
            dqkv_ref[sl, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh] = \
                dv.astype(dqkv_ref.dtype)
            dbias_ref[(base + g) % Gb, hh] += ds


def storep_bwd(p2, qkv2, dctx2, bias_shape, n, scale, num_heads):
    M, C3 = qkv2.shape
    C = C3 // 3
    BW = M // n
    N, BWm = 2 * n, BW // 2
    nWb = bias_shape[0]

    def ok(G):
        return (BWm % G == 0 and (nWb == 1 or nWb % G == 0)
                and (G * N) % 8 == 0
                and G * (N * C3 * 12 + num_heads * N * N * (4 + 2))
                <= 10 * 1024 * 1024)
    G = 8
    while G > 1 and not ok(G):
        G //= 2

    spec2 = lambda c: pl.BlockSpec((G * N, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((G * num_heads, N, N), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(bias_shape, lambda i: (0,) * len(bias_shape),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_storep_kernel, seq_n=N, scale=scale,
                          num_heads=num_heads),
        grid=(BWm // G,),
        in_specs=[p_spec, spec2(C3), spec2(C)],
        out_specs=(spec2(C3), bias_spec),
        out_shape=(jax.ShapeDtypeStruct((M, C3), qkv2.dtype),
                   jax.ShapeDtypeStruct(bias_shape, jnp.float32)),
        scratch_shapes=[pltpu.VMEM((G * num_heads, N, N), jnp.float32)],
    )(p2, qkv2, dctx2)


def _storep_1pass_kernel(p_ref, qkv_ref, dctx_ref, dqkv_ref, dbias_ref,
                         *, seq_n: int, scale: float, num_heads: int,
                         with_dbias: bool = True):
    """Single-pass stored-p backward: no p/dp VMEM scratch round-trips —
    everything per unit stays in registers."""
    GN, C3 = qkv_ref.shape
    N = seq_n
    G = GN // N
    C = C3 // 3
    Gb = dbias_ref.shape[0]
    Dh = C // num_heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    ones = jnp.ones((N, 1), jnp.float32)
    base = pl.program_id(0) * G
    dt = qkv_ref.dtype
    for g in range(G):
        rows = qkv_ref[g * N:(g + 1) * N]
        for hh in range(num_heads):
            qd = rows[:, hh * Dh:(hh + 1) * Dh]
            kd = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            vd = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            dctx_d = dctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh]
            pd = p_ref[g * num_heads + hh]
            p = pd.astype(jnp.float32)
            dp = jax.lax.dot_general(dctx_d, vd, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dv = jax.lax.dot_general(pd, dctx_d, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            pdp = p * dp
            rd = jax.lax.dot_general(pdp, ones, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = pdp - p * rd
            dsd = ds.astype(dt)
            dq = jax.lax.dot_general(dsd, kd, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(dsd, qd, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            sl = slice(g * N, (g + 1) * N)
            dqkv_ref[sl, hh * Dh:(hh + 1) * Dh] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[sl, C + hh * Dh:C + (hh + 1) * Dh] = \
                dk.astype(dqkv_ref.dtype)
            dqkv_ref[sl, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh] = \
                dv.astype(dqkv_ref.dtype)
            if with_dbias:
                dbias_ref[(base + g) % Gb, hh] += ds


def storep_1pass(p2, qkv2, dctx2, bias_shape, n, scale, num_heads,
                 with_dbias=True):
    M, C3 = qkv2.shape
    C = C3 // 3
    BW = M // n
    N, BWm = 2 * n, BW // 2
    nWb = bias_shape[0]

    def ok(G):
        return (BWm % G == 0 and (nWb == 1 or nWb % G == 0)
                and (G * N) % 8 == 0
                and G * (N * C3 * 12 + num_heads * N * N * 2)
                <= 10 * 1024 * 1024)
    G = 8
    while G > 1 and not ok(G):
        G //= 2

    spec2 = lambda c: pl.BlockSpec((G * N, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((G * num_heads, N, N), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(bias_shape, lambda i: (0,) * len(bias_shape),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_storep_1pass_kernel, seq_n=N, scale=scale,
                          num_heads=num_heads, with_dbias=with_dbias),
        grid=(BWm // G,),
        in_specs=[p_spec, spec2(C3), spec2(C)],
        out_specs=(spec2(C3), bias_spec),
        out_shape=(jax.ShapeDtypeStruct((M, C3), qkv2.dtype),
                   jax.ShapeDtypeStruct(bias_shape, jnp.float32)),
    )(p2, qkv2, dctx2)


def _base_nodbias_kernel(qkv_ref, dctx_ref, bias_ref, dqkv_ref, dbias_ref,
                         p_ref, dp_ref, *, seq_n: int, scale: float,
                         num_heads: int):
    """Current two-pass recompute kernel but WITHOUT the per-unit dbias
    += accumulation (measures its serialization cost)."""
    GN, C3 = qkv_ref.shape
    N = seq_n
    G = GN // N
    C = C3 // 3
    Gb = bias_ref.shape[0]
    Dh = C // num_heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    ones = jnp.ones((N, 1), jnp.float32)
    base = pl.program_id(0) * G
    dt = qkv_ref.dtype
    for g in range(G):
        rows = qkv_ref[g * N:(g + 1) * N]
        for hh in range(num_heads):
            qd = rows[:, hh * Dh:(hh + 1) * Dh]
            kd = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            vd = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            dctx_d = dctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh]
            s = jax.lax.dot_general(qd, kd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[(base + g) % Gb, hh]
            e = jnp.exp(jnp.minimum(s, 60.0))
            denom = jax.lax.dot_general(e, ones, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            p = e * pl.reciprocal(jnp.maximum(denom, 1e-30), approx=True)
            dp = jax.lax.dot_general(dctx_d, vd, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            p_ref[g * num_heads + hh] = p
            dp_ref[g * num_heads + hh] = dp
    for g in range(G):
        rows = qkv_ref[g * N:(g + 1) * N]
        for hh in range(num_heads):
            qd = rows[:, hh * Dh:(hh + 1) * Dh]
            kd = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            dctx_d = dctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh]
            p = p_ref[g * num_heads + hh]
            dp = dp_ref[g * num_heads + hh]
            pd = p.astype(dt)
            dv = jax.lax.dot_general(pd, dctx_d, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            pdp = p * dp
            rd = jax.lax.dot_general(pdp, ones, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = pdp - p * rd
            dsd = ds.astype(dt)
            dq = jax.lax.dot_general(dsd, kd, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(dsd, qd, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            sl = slice(g * N, (g + 1) * N)
            dqkv_ref[sl, hh * Dh:(hh + 1) * Dh] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[sl, C + hh * Dh:C + (hh + 1) * Dh] = \
                dk.astype(dqkv_ref.dtype)
            dqkv_ref[sl, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh] = \
                dv.astype(dqkv_ref.dtype)


def base_nodbias(qkv2, dctx2, bias_m, n, scale, num_heads,
                 scratch_dtype=jnp.float32):
    M, C3 = qkv2.shape
    C = C3 // 3
    BW = M // n
    N, BWm = 2 * n, BW // 2
    nWb = bias_m.shape[0]

    def ok(G):
        return (BWm % G == 0 and (nWb == 1 or nWb % G == 0)
                and (G * N) % 8 == 0
                and G * (N * C3 * 12 + 2 * num_heads * N * N * 4)
                <= 10 * 1024 * 1024)
    G = 8
    while G > 1 and not ok(G):
        G //= 2

    spec2 = lambda c: pl.BlockSpec((G * N, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(bias_m.shape, lambda i: (0,) * bias_m.ndim,
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_base_nodbias_kernel, seq_n=N, scale=scale,
                          num_heads=num_heads),
        grid=(BWm // G,),
        in_specs=[spec2(C3), spec2(C), bias_spec],
        out_specs=(spec2(C3), bias_spec),
        out_shape=(jax.ShapeDtypeStruct((M, C3), qkv2.dtype),
                   jax.ShapeDtypeStruct(bias_m.shape, jnp.float32)),
        scratch_shapes=[pltpu.VMEM((G * num_heads, N, N), scratch_dtype),
                        pltpu.VMEM((G * num_heads, N, N), scratch_dtype)],
    )(qkv2, dctx2, bias_m)


def _split_kernel(p_ref, q_ref, k_ref, v_ref, dctx_ref, dq_ref, dk_ref,
                  dv_ref, dbias_ref, *, seq_n: int, scale: float,
                  num_heads: int):
    """Stored-p single-pass backward on SPLIT q/k/v buffers: every
    per-head 32-lane slice starts inside one 128-lane vreg tile (no
    boundary-straddling loads/stores at narrow C)."""
    GN, C = q_ref.shape
    N = seq_n
    G = GN // N
    Gb = dbias_ref.shape[0]
    Dh = C // num_heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    ones = jnp.ones((N, 1), jnp.float32)
    base = pl.program_id(0) * G
    dt = q_ref.dtype
    for g in range(G):
        sl = slice(g * N, (g + 1) * N)
        for hh in range(num_heads):
            hs = slice(hh * Dh, (hh + 1) * Dh)
            qd = q_ref[sl, hs]
            kd = k_ref[sl, hs]
            vd = v_ref[sl, hs]
            dctx_d = dctx_ref[sl, hs]
            pd = p_ref[g * num_heads + hh]
            p = pd.astype(jnp.float32)
            dp = jax.lax.dot_general(dctx_d, vd, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dv = jax.lax.dot_general(pd, dctx_d, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            pdp = p * dp
            rd = jax.lax.dot_general(pdp, ones, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = pdp - p * rd
            dsd = ds.astype(dt)
            dq = jax.lax.dot_general(dsd, kd, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(dsd, qd, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            dq_ref[sl, hs] = dq.astype(dt)
            dk_ref[sl, hs] = dk.astype(dt)
            dv_ref[sl, hs] = dv.astype(dt)
            dbias_ref[(base + g) % Gb, hh] += ds


def split_bwd(p2, q2, k2, v2, dctx2, bias_shape, n, scale, num_heads):
    M, C = q2.shape
    BW = M // n
    N, BWm = 2 * n, BW // 2
    nWb = bias_shape[0]

    def ok(G):
        return (BWm % G == 0 and (nWb == 1 or nWb % G == 0)
                and (G * N) % 8 == 0
                and G * (N * C * 7 * 4 + num_heads * N * N * 2)
                <= 10 * 1024 * 1024)
    G = 8
    while G > 1 and not ok(G):
        G //= 2

    spec2 = lambda c: pl.BlockSpec((G * N, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((G * num_heads, N, N), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(bias_shape, lambda i: (0,) * len(bias_shape),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_split_kernel, seq_n=N, scale=scale,
                          num_heads=num_heads),
        grid=(BWm // G,),
        in_specs=[p_spec, spec2(C), spec2(C), spec2(C), spec2(C)],
        out_specs=(spec2(C), spec2(C), spec2(C), bias_spec),
        out_shape=(jax.ShapeDtypeStruct((M, C), q2.dtype),
                   jax.ShapeDtypeStruct((M, C), q2.dtype),
                   jax.ShapeDtypeStruct((M, C), q2.dtype),
                   jax.ShapeDtypeStruct(bias_shape, jnp.float32)),
    )(p2, q2, k2, v2, dctx2)


STAGES = {"1": (96, 56, 3), "2": (192, 28, 6), "3": (384, 14, 12)}


def run(tag, floor):
    C, HW, nH = STAGES[tag]
    nW = (HW // 7) ** 2
    BW = B * nW
    n = 49
    N = 2 * n
    BWm = BW // 2
    rng = np.random.default_rng(0)
    qkv2 = jnp.asarray(rng.normal(size=(BW * n, 3 * C)) * 0.1, jnp.bfloat16)
    g2 = jnp.asarray(rng.normal(size=(BW * n, C)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(1, nH, n, n)), jnp.float32)
    scale = (C // nH) ** -0.5
    # synthetic stored p: random row-normalized, merged-pair layout
    praw = np.abs(rng.normal(size=(BWm * nH, N, N))) + 0.01
    praw = praw / praw.sum(-1, keepdims=True)
    p2 = jnp.asarray(praw, jnp.bfloat16)
    bias_m_shape = (1, nH, N, N)

    bias_m = pa._merge_bias_pairs(bias)

    def base(qkv2, g2):
        dqkv2, dbias = pa.attention_core_bwd_flat(qkv2, g2, bias, n,
                                                  scale, nH)
        return dqkv2.astype(jnp.float32).sum() * 1e-6 + dbias.sum() * 1e-6

    def storep(p2, qkv2, g2):
        dqkv2, dbias = storep_bwd(p2, qkv2, g2, bias_m_shape, n, scale, nH)
        return dqkv2.astype(jnp.float32).sum() * 1e-6 + dbias.sum() * 1e-6

    def storep1(p2, qkv2, g2):
        dqkv2, dbias = storep_1pass(p2, qkv2, g2, bias_m_shape, n, scale,
                                    nH)
        return dqkv2.astype(jnp.float32).sum() * 1e-6 + dbias.sum() * 1e-6

    def storep1_nb(p2, qkv2, g2):
        dqkv2, dbias = storep_1pass(p2, qkv2, g2, bias_m_shape, n, scale,
                                    nH, with_dbias=False)
        return dqkv2.astype(jnp.float32).sum() * 1e-6 + dbias.sum() * 1e-6

    def base_nb(qkv2, g2):
        dqkv2, dbias = base_nodbias(qkv2, g2, bias_m, n, scale, nH)
        return dqkv2.astype(jnp.float32).sum() * 1e-6 + dbias.sum() * 1e-6

    q2s = qkv2[:, :C]
    k2s = qkv2[:, C:2 * C]
    v2s = qkv2[:, 2 * C:]

    def splitv(p2, q2s, k2s, v2s, g2):
        dq, dk, dv, dbias = split_bwd(p2, q2s, k2s, v2s, g2, bias_m_shape,
                                      n, scale, nH)
        return (dq.astype(jnp.float32).sum() * 1e-6
                + dk.astype(jnp.float32).sum() * 1e-6
                + dv.astype(jnp.float32).sum() * 1e-6
                + dbias.sum() * 1e-6)

    units = BWm * nH
    for name, fn, args in (
            ("base      ", base, (qkv2, g2)),
            ("storep1p  ", storep1, (p2, qkv2, g2)),
            ("split1p   ", splitv, (p2, q2s, k2s, v2s, g2)),
    ):
        t = timeit(fn, floor, *args)
        print(f"stage {tag} ({HW}x{HW}x{C}, {units} units): {name} "
              f"{t:6.2f} ms ({t*1e6/units:5.0f} ns/u)", flush=True)


if __name__ == "__main__":
    floor = measure_floor()
    print(f"floor: {floor*1e3/ITERS:.2f} ms/exec-equiv", flush=True)
    for tag in (sys.argv[1:] or ["1", "2", "3"]):
        run(tag, floor)
