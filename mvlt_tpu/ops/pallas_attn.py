"""Pallas TPU kernels: fused Swin window attention.

The XLA path materializes the per-window score tensor
``(B*nW, nH, 49, 49)`` in f32 through three HBM round trips (scores,
softmax, context) with a 49-lane layout that pads 49 -> 128; profiled on
v5e this makes stage-1 window attention ~40x slower than its HBM
speed-of-light.  This kernel fuses scale -> QK^T -> +bias -> softmax ->
PV per window entirely in VMEM: one HBM read of q/k/v, one write of the
context.

Layout: q/k/v are (BW, nH, N, Dh) with BW = batch * windows_per_image and
window index fastest-varying; ``bias`` is (nWb, nH, N, N) — relative
position bias (+ SW-MSA shift mask, reference
visual_feature_extractor.py:240-249) for each in-image window pattern;
window ``i`` uses pattern ``i % nWb`` (nWb == 1 for unshifted blocks).

Grid is (BW // G,) with G windows per program (G | nWb or nWb == 1 so the
bias block stays contiguous).  Softmax runs in f32; dots accumulate in
f32 on the MXU.

Backward: ``jax.custom_vjp`` recomputes attention weights with plain XLA
einsums (flash-style recompute; the fused forward is the hot serving
path, training keeps XLA's fused backward).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    G, nH, N, Dh = q_ref.shape
    Gb = bias_ref.shape[0]     # 1 when every window shares one bias pattern
    for g in range(G):
        for h in range(nH):
            q = q_ref[g, h].astype(jnp.float32) * scale        # (N, Dh)
            k = k_ref[g, h].astype(jnp.float32)
            v = v_ref[g, h]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (N, N)
            s = s + bias_ref[g % Gb, h]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (N, Dh)
            o_ref[g, h] = o.astype(o_ref.dtype)


def _forward(q, k, v, bias, *, scale: float, group: int,
             interpret: bool = False):
    BW, nH, N, Dh = q.shape
    nWb = bias.shape[0]
    G = group
    while BW % G != 0 or (nWb > 1 and nWb % G != 0):
        G //= 2
    G = max(G, 1)

    if nWb > 1:
        # Shifted blocks: nWb == windows-per-image. Grid (patterns, batch)
        # with batch fastest-varying, so each bias block is DMA'd once and
        # reused across the whole batch instead of re-streamed per program.
        B = BW // nWb
        grid = (nWb // G, B)
        qkv_map = lambda i_w, i_b: (i_b * (nWb // G) + i_w, 0, 0, 0)
        bias_spec = pl.BlockSpec((G, nH, N, N),
                                 lambda i_w, i_b: (i_w, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        grid = (BW // G,)
        qkv_map = lambda i: (i, 0, 0, 0)
        bias_spec = pl.BlockSpec((1, nH, N, N),
                                 lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    def qkv_spec():
        return pl.BlockSpec((G, nH, N, Dh), qkv_map,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[qkv_spec(), qkv_spec(), qkv_spec(), bias_spec],
        out_specs=qkv_spec(),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def _xla_reference(q, k, v, bias, scale):
    BW, nH, N, Dh = q.shape
    nWb = bias.shape[0]
    qf = q.astype(jnp.float32) * scale
    s = jnp.einsum("whnd,whmd->whnm", qf, k.astype(jnp.float32))
    b = bias[jnp.arange(BW) % nWb] if nWb > 1 else bias[0][None]
    p = jax.nn.softmax(s + b, axis=-1)
    return jnp.einsum("whnm,whmd->whnd", p.astype(v.dtype), v), p


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def window_attention(q, k, v, bias, scale: float, group: int = 8,
                     interpret: bool = False):
    """Fused per-window attention.

    q/k/v: (BW, nH, N, Dh); bias: (nWb, nH, N, N) f32 with nWb == 1 or
    nWb == windows-per-image. Returns context (BW, nH, N, Dh)."""
    return _forward(q, k, v, bias, scale=scale, group=group,
                    interpret=interpret)


def _fwd(q, k, v, bias, scale, group, interpret):
    out = _forward(q, k, v, bias, scale=scale, group=group,
                   interpret=interpret)
    return out, (q, k, v, bias)


def _bwd(scale, group, interpret, res, g):
    q, k, v, bias = res
    nWb = bias.shape[0]
    _, p = _xla_reference(q, k, v, bias, scale)       # recompute weights
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dp = jnp.einsum("whnd,whmd->whnm", gf, vf)
    dv = jnp.einsum("whnm,whnd->whmd", p, gf).astype(v.dtype)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (jnp.einsum("whnm,whmd->whnd", ds, k.astype(jnp.float32))
          * scale).astype(q.dtype)
    dk = jnp.einsum("whnm,whnd->whmd", ds, q.astype(jnp.float32) * scale
                    ).astype(k.dtype)
    if nWb > 1:
        BW = q.shape[0]
        seg = jnp.arange(BW) % nWb
        dbias = jax.ops.segment_sum(ds, seg, num_segments=nWb)
    else:
        dbias = jnp.sum(ds, axis=0, keepdims=True)
    return dq, dk, dv, dbias.astype(bias.dtype)


window_attention.defvjp(_fwd, _bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    *, scale: Optional[float] = None):
    """Placeholder hook for the fusion-encoder attention (sequences are
    <=250 tokens and matmul-dominated; XLA already runs them at ~40% MXU —
    returns None to signal the XLA path)."""
    return None
