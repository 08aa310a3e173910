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
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvlt_tpu.utils.env import env_flag, env_int


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
            fast: bool = False):
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
            p = _softmax_rows(s, fast)
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
        functools.partial(_kernel, scale=scale,
                          fast=(q.dtype == jnp.bfloat16 and not interpret)),
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


# ---------------------------------------------------------------------------
# wider fusion: qkv projection + window attention + output projection
# ---------------------------------------------------------------------------

def _block_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
                  o_ref, ctx_ref, *, scale: float, num_heads: int,
                  fast: bool = False):
    """Per program: G windows. x (G, N, C) -> qkv matmul -> per-window
    attention -> proj -> o (G, N, C). qkv/scores/ctx never leave VMEM."""
    G, N, C = x_ref.shape
    Gb = bias_ref.shape[0]
    Dh = C // num_heads

    # per-window matmuls: a (G*N, C) collapse is not sublane-aligned for
    # N=49, Mosaic rejects the shape cast — loop windows instead
    for g in range(G):
        rows = jax.lax.dot_general(
            x_ref[g], wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        rows = (rows + bqkv_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
        for h in range(num_heads):
            q = rows[:, h * Dh:(h + 1) * Dh].astype(jnp.float32) * scale
            k = rows[:, C + h * Dh:C + (h + 1) * Dh].astype(jnp.float32)
            v = rows[:, 2 * C + h * Dh:2 * C + (h + 1) * Dh]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + bias_ref[g % Gb, h]
            p = _softmax_rows(s, fast)
            ctx = jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            ctx_ref[g, :, h * Dh:(h + 1) * Dh] = ctx.astype(ctx_ref.dtype)

    for g in range(G):
        out = jax.lax.dot_general(
            ctx_ref[g], wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + bproj_ref[:].astype(jnp.float32)
        o_ref[g] = out.astype(o_ref.dtype)


def _merge_bias_pairs(bias):
    """Block-diagonal merge of adjacent windows' bias patterns:
    (nWb, nH, N, N) -> (max(nWb//2,1), nH, 2N, 2N) with -1e9 off-diagonal
    (exact: the row max is unaffected and exp(-1e9 - max) == 0)."""
    nWb, nH, N, _ = bias.shape
    neg = jnp.full((1 if nWb == 1 else nWb // 2, nH, 2 * N, 2 * N), -1e9,
                   bias.dtype)
    if nWb == 1:
        top = bot = bias
    else:
        b = bias.reshape(nWb // 2, 2, nH, N, N)
        top, bot = b[:, 0], b[:, 1]
    return neg.at[:, :, :N, :N].set(top).at[:, :, N:, N:].set(bot)


def _warn_storep_unused(reason: str) -> None:
    """The caller opted into the stored-p backward (MVLT_STOREP) but the
    recompute kernel runs instead — correct, but an invisible perf cliff
    unless surfaced."""
    import warnings
    warnings.warn(f"stored-p backward requested but falling back to the "
                  f"recompute kernel: {reason}")


def _can_merge_pairs(n: int, BW: int, nWb: int) -> bool:
    """SINGLE predicate for window-pair merging — used by the forward
    (:func:`_merge_window_pairs`) and the stored-residual backward
    (:func:`attention_core_bwd_flat`), so the forward's merge decision
    and the backward's stored-p shape check can never diverge."""
    return n <= 64 and BW % 2 == 0 and (nWb == 1 or nWb % 2 == 0)


def _merge_window_pairs(x, bias):
    """Pair adjacent windows into one block-diagonal attention group.

    With N <= 64 the (N, N) score tile wastes >half of the 128-lane MXU/VPU
    tile; a merged (2N, 2N) block-diagonal attention fills it.  Pairing is
    contiguous in the window axis, so x just reshapes
    (BW, N, C) -> (BW/2, 2N, C) — free.  Returns (x', bias', merged)."""
    BW, N, C = x.shape
    nWb = bias.shape[0]
    if not _can_merge_pairs(N, BW, nWb):
        return x, bias, False
    return x.reshape(BW // 2, 2 * N, C), _merge_bias_pairs(bias), True


def _block_forward(x, wqkv, bqkv, wproj, bproj, bias, *, scale, num_heads,
                   group, interpret):
    orig_shape = x.shape
    x, bias, merged = _merge_window_pairs(x, bias)
    BW, N, C = x.shape
    nWb = bias.shape[0]
    G = max(group // 2, 1) if merged else group  # keep rows/program constant
    # VMEM: x/ctx/out blocks (bf16, in+out double-buffered) + per-window
    # f32 qkv rows; cap the block working set so wide-C callers shrink G
    while G > 1 and G * N * C * 10 > 6 * 1024 * 1024:
        G //= 2
    while BW % G != 0 or (nWb > 1 and nWb % G != 0):
        G //= 2
    G = max(G, 1)

    if nWb > 1:
        B = BW // nWb
        grid = (nWb // G, B)
        x_map = lambda i_w, i_b: (i_b * (nWb // G) + i_w, 0, 0)
        const2 = lambda i_w, i_b: (0, 0)
        const1 = lambda i_w, i_b: (0,)
        bias_spec = pl.BlockSpec((G, num_heads, N, N),
                                 lambda i_w, i_b: (i_w, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        grid = (BW // G,)
        x_map = lambda i: (i, 0, 0)
        const2 = lambda i: (0, 0)
        const1 = lambda i: (0,)
        bias_spec = pl.BlockSpec((1, num_heads, N, N), lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    x_spec = pl.BlockSpec((G, N, C), x_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_block_kernel, scale=scale, num_heads=num_heads,
                          fast=(x.dtype == jnp.bfloat16 and not interpret)),
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec(wqkv.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bqkv.shape, const1, memory_space=pltpu.VMEM),
            pl.BlockSpec(wproj.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bproj.shape, const1, memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((G, N, C), x.dtype)],
        interpret=interpret,
    )(x, wqkv, bqkv, wproj, bproj, bias)
    return out.reshape(orig_shape) if merged else out


def _block_xla_ref(x, wqkv, bqkv, wproj, bproj, bias, scale, num_heads):
    BW, N, C = x.shape
    Dh = C // num_heads
    nWb = bias.shape[0]
    qkv = (x.reshape(-1, C) @ wqkv + bqkv).reshape(BW, N, 3, num_heads, Dh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    s = jnp.einsum("whnd,whmd->whnm", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    b = bias[jnp.arange(BW) % nWb] if nWb > 1 else bias[0][None]
    p = jax.nn.softmax(s + b, axis=-1)
    ctx = jnp.einsum("whnm,whmd->whnd", p.astype(v.dtype), v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(-1, C)
    return (ctx @ wproj + bproj).reshape(BW, N, C).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def window_block_attention(x, wqkv, bqkv, wproj, bproj, bias,
                           scale: float, num_heads: int, group: int = 16,
                           interpret: bool = False):
    """Fused LN-free Swin attention block: qkv proj + window attention +
    output proj in one kernel. x: (BW, N, C) post-LN windows."""
    return _block_forward(x, wqkv, bqkv, wproj, bproj, bias, scale=scale,
                          num_heads=num_heads, group=group,
                          interpret=interpret)


# ---------------------------------------------------------------------------
# fusion-encoder attention: qkv + self-attention + out-projection fused,
# with a per-sample additive KEY bias (the bidirectional padding mask,
# masks.py mask_to_bias of a (B, S) key mask)
# ---------------------------------------------------------------------------

def _seq_attn_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                     kbias_ref, o_ref, ctx_ref, *, scale: float,
                     num_heads: int, seq_n: int, fast: bool = False):
    GN, C = x_ref.shape
    N = seq_n
    G = GN // N
    Dh = C // num_heads
    base = pl.program_id(0) * G      # kbias is the full (B, N) array

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    QKV = dot(x_ref[:], wqkv_ref[:])
    QKV = (QKV + bqkv_ref[:].astype(jnp.float32)).astype(x_ref.dtype)

    for g in range(G):
        rows = QKV[g * N:(g + 1) * N]
        kbias = kbias_ref[base + g]                          # (N,) additive
        for hh in range(num_heads):
            q = rows[:, hh * Dh:(hh + 1) * Dh].astype(jnp.float32) * scale
            k = rows[:, C + hh * Dh:C + (hh + 1) * Dh].astype(jnp.float32)
            v = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + kbias[None, :]
            p = _softmax_rows(s, fast)
            ctx = jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            ctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh] = \
                ctx.astype(ctx_ref.dtype)

    out = dot(ctx_ref[:], wproj_ref[:])
    o_ref[:] = (out + bproj_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _seq_attn_xla_ref(x, wqkv, bqkv, wproj, bproj, kbias, scale, num_heads):
    B, N, C = x.shape
    Dh = C // num_heads
    qkv = (x.reshape(-1, C) @ wqkv + bqkv).reshape(B, N, 3, num_heads, Dh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    s = s + kbias[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(-1, C)
    return (ctx @ wproj + bproj).reshape(B, N, C).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_seq_attention(x, wqkv, bqkv, wproj, bproj, kbias,
                        scale: float, num_heads: int, group: int = 8,
                        interpret: bool = False):
    """Fused qkv + bidirectional self-attention + out projection for the
    fusion encoder.  x: (B, N, C); kbias: (B, N) additive key bias
    (0 / -10000 from masks.mask_to_bias).  Pads N to a multiple of 8
    internally (padded keys masked, padded query rows sliced off)."""
    B, N, C = x.shape
    N_pad = -(-N // 8) * 8
    if N_pad != N:
        x = jnp.pad(x, ((0, 0), (0, N_pad - N), (0, 0)))
        kbias = jnp.pad(kbias, ((0, 0), (0, N_pad - N)),
                        constant_values=-1e9)

    G = group
    while G > 1 and (B % G != 0
                     or G * N_pad * C * 9 * 4 > 8 * 1024 * 1024):
        G //= 2

    x2 = x.reshape(B * N_pad, C)
    grid = (B // G,)
    x_spec = pl.BlockSpec((G * N_pad, C), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    # full kbias resident (tiny: B*N_pad f32); a (G, N_pad) block would
    # violate the 8-sublane block constraint for small G
    kb_spec = pl.BlockSpec((B, N_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_seq_attn_kernel, scale=scale,
                          num_heads=num_heads, seq_n=N_pad,
                          fast=(x.dtype == jnp.bfloat16 and not interpret)),
        grid=grid,
        in_specs=[x_spec, const_spec(wqkv.shape), const_spec(bqkv.shape),
                  const_spec(wproj.shape), const_spec(bproj.shape), kb_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((G * N_pad, C), x.dtype)],
        interpret=interpret,
    )(x2, wqkv, bqkv, wproj, bproj, kbias)
    return out.reshape(B, N_pad, C)[:, :N]


def _seq_fwd(x, wqkv, bqkv, wproj, bproj, kbias, scale, num_heads, group,
             interpret):
    out = fused_seq_attention(x, wqkv, bqkv, wproj, bproj, kbias, scale,
                              num_heads, group, interpret)
    return out, (x, wqkv, bqkv, wproj, bproj, kbias)


def _seq_bwd(scale, num_heads, group, interpret, res, g):
    x, wqkv, bqkv, wproj, bproj, kbias = res

    def ref(x, wqkv, bqkv, wproj, bproj, kbias):
        return _seq_attn_xla_ref(x, wqkv, bqkv, wproj, bproj, kbias, scale,
                                 num_heads)

    _, vjp = jax.vjp(ref, x, wqkv, bqkv, wproj, bproj, kbias)
    return vjp(g)


fused_seq_attention.defvjp(_seq_fwd, _seq_bwd)


# ---------------------------------------------------------------------------
# widest fusion: the whole Swin block (LN1 -> attn -> +res -> LN2 -> MLP ->
# +res), deterministic path (DropPath/dropout are identity at inference)
# ---------------------------------------------------------------------------

def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7):
    Mosaic lowers neither erf nor erfc, but exp it has."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _softmax_rows(s, fast: bool):
    """Row softmax in f32.  ``fast`` uses the TPU approximate reciprocal
    (~2^-14 relative error) instead of a true divide — bf16 outputs only."""
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if fast:
        return p * pl.reciprocal(denom, approx=True)
    return p / denom


def _gelu_exact(m, fast: bool):
    """GELU for the kernel body.  The exact path uses the A&S rational
    erf (1.5e-7; Mosaic lowers neither erf nor erfc).  The bf16 fast path
    uses the tanh formulation (native VPU tanh, ~half the elementwise
    ops); its deviation from exact GELU is <=1.5e-3 absolute — below the
    4e-3 relative resolution of the bf16 activations it feeds."""
    if fast:
        inner = 0.7978845608028654 * (m + 0.044715 * m * m * m)
        return 0.5 * m * (1.0 + jnp.tanh(inner))
    return 0.5 * m * (1.0 + _erf_approx(m * 0.7071067811865476))


def _ln(xf, scale, bias, eps=1e-5, fast: bool = False):
    if fast:
        # Moments as MXU ones-matvecs: the VPU lane-reduction tree
        # (~7 shuffle+add steps per granule, twice) moves to the idle MXU.
        # E[x^2]-E[x]^2 in f32 is fine here: post-LN activations are O(1).
        C = xf.shape[-1]
        ones = jnp.ones((C, 1), jnp.float32)
        mv = lambda a: jax.lax.dot_general(
            a, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mu = mv(xf) * (1.0 / C)
        var = mv(xf * xf) * (1.0 / C) - mu * mu
        return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _attend(q, k, v, bias, fast: bool, scale: float = 1.0,
            want_p: bool = False):
    """One head's window attention core: scores -> softmax -> PV, f32.

    ``q``/``k`` arrive UNSCALED in the caller's compute dtype; ``scale``
    is folded into the f32 scores AFTER the QK^T dot.  On the bf16 fast
    path that keeps both dot operands bf16 — the v5e MXU is bf16-native
    and f32 matmuls are emulated multi-pass, so a pre-scaled f32 q would
    silently run the dot several times slower.  The f32/slow path
    reproduces the original ordering (q*scale before the dot) bit-exactly.

    Fast path keeps softmax UN-normalized through the PV dot and rescales
    the (N, Dh) context instead of the (N, N) weights — the row-sum is an
    MXU ones-matvec and the divide is one approximate reciprocal on a
    (N, 1) column (exact same math by linearity of the PV product).
    It also skips the row-max subtraction: softmax is shift-invariant, so
    the subtraction is pure overflow protection; ``exp(min(s, 60))`` is
    bit-equivalent in the entire sane-logit range (|s| <= 60 covers any
    trained model at head-dim scaling; e^60 * N ~ 1e28 is far from f32
    overflow) and saturating beyond only flattens an already-one-hot row.
    The ``max(rowsum, 1e-30)`` guard keeps fully-masked (padded) rows
    finite.  The f32/interpret path is the exact textbook softmax."""
    if fast:
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias
    else:
        s = jax.lax.dot_general(q.astype(jnp.float32) * scale,
                                k.astype(jnp.float32),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias
    if fast:
        p = jnp.exp(jnp.minimum(s, 60.0))
        N = p.shape[-1]
        ones = jnp.ones((N, 1), jnp.float32)
        rowsum = jax.lax.dot_general(p, ones, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        ctx = jax.lax.dot_general(p.astype(v.dtype), v,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        rowsum = jnp.maximum(rowsum, 1e-30)
        recip = pl.reciprocal(rowsum, approx=True)
        if want_p:
            # normalized softmax as a SIDE product (ctx math unchanged).
            # The stored side uses the EXACT reciprocal so stored rows sum
            # to 1 up to storage dtype — the storep backward's softmax
            # Jacobian (ds = p*dp − p·rowsum(p*dp)) assumes normalized p;
            # ctx keeps the approx fast path.
            return ctx * recip, p * (1.0 / rowsum)
        return ctx * recip
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (ctx, p) if want_p else ctx


def _full_body(X, dt, refs, bias_ref, ctx_ref, *, scale, num_heads,
               window_n, fast, mask_ref=None, mlp_chunks: int = 1,
               dp1_ref=None, dp2_ref=None, qkv_ref=None, p_ref=None):
    """Shared whole-block math on a 2-D (R, C) f32 value ``X``; the big
    matmuls (qkv / proj / MLP) run with M = R rows — near-full MXU row
    utilization — and the attention core slices per-group rows out of the
    qkv VALUE (plain 2-D slices, no Mosaic-hostile reshapes).  Returns the
    f32 block output (R, C).

    ``mask_ref`` (optional): head-independent additive mask patterns
    (Gb, N, N) (e.g. the SW-MSA shift mask, compact bf16) added on top of
    the per-head ``bias_ref`` — keeps big shifted stages' bias VMEM nH
    times smaller.  ``mlp_chunks`` splits the MLP over the hidden (4C)
    dim so the f32 intermediate fits tight VMEM budgets."""
    (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
     ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref) = refs
    R, C = X.shape
    N = window_n
    G = R // N
    Gb = mask_ref.shape[0] if mask_ref is not None else bias_ref.shape[0]
    Dh = C // num_heads

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    H1 = _ln(X, ln1s_ref[:], ln1b_ref[:], fast=fast)
    QKV = dot(H1.astype(dt), wqkv_ref[:])
    QKV = (QKV + bqkv_ref[:].astype(jnp.float32)).astype(dt)
    if qkv_ref is not None:
        # store-residual training mode: the backward consumes the exact
        # in-kernel QKV (and ctx) instead of recomputing the forward
        qkv_ref[:] = QKV

    for g in range(G):
        rows = QKV[g * N:(g + 1) * N]                       # (N, 3C)
        gmask = None
        if mask_ref is not None:
            gmask = mask_ref[g % Gb].astype(jnp.float32)
        for hh in range(num_heads):
            q = rows[:, hh * Dh:(hh + 1) * Dh]
            k = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            v = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            if mask_ref is not None:
                hb = bias_ref[0, hh] + gmask
            else:
                hb = bias_ref[g % Gb, hh]
            if p_ref is not None:
                # store the normalized softmax for the stored-p backward
                # (attention_core_bwd_flat p2 path); ctx math unchanged
                ctx, pnorm = _attend(q, k, v, hb, fast, scale, want_p=True)
                p_ref[g * num_heads + hh] = pnorm.astype(p_ref.dtype)
            else:
                ctx = _attend(q, k, v, hb, fast, scale)
            ctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh] = \
                ctx.astype(ctx_ref.dtype)

    attn = dot(ctx_ref[:], wproj_ref[:])
    attn = attn + bproj_ref[:].astype(jnp.float32)
    if dp1_ref is not None:
        # stochastic depth as per-row multipliers (0 or 1/keep), applied
        # to the whole branch incl. its bias — matches DropPath semantics
        attn = attn * dp1_ref[:]
    res1 = X + attn
    H2 = _ln(res1, ln2s_ref[:], ln2b_ref[:], fast=fast)
    H2d = H2.astype(dt)
    I = w1_ref.shape[-1]
    ck = I // mlp_chunks
    mlp = None
    for i in range(mlp_chunks):
        m = dot(H2d, w1_ref[:, i * ck:(i + 1) * ck])
        m = m + b1_ref[i * ck:(i + 1) * ck].astype(jnp.float32)
        m = _gelu_exact(m, fast)
        part = dot(m.astype(dt), w2_ref[i * ck:(i + 1) * ck, :])
        mlp = part if mlp is None else mlp + part
    mlp = mlp + b2_ref[:].astype(jnp.float32)
    if dp2_ref is not None:
        mlp = mlp * dp2_ref[:]
    return res1 + mlp


def _full_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
                 b2_ref, bias_ref, o_ref, ctx_ref, *, scale: float,
                 num_heads: int, window_n: int, fast: bool = False):
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    X = x_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _shift_runs(H: int, W: int, window: int, shift: int):
    """Static row-run map from UNSHIFTED window-major token layout to
    SHIFTED window-major layout for one image (``s[dst] = x[src]``).

    The cyclic roll splits every shifted-window row into at most two
    contiguous source runs (a column range inside one source window),
    so the whole permutation is ~2 * windows * window_rows slice copies —
    cheap VPU work that replaces the XLA-side roll/partition HBM passes
    (reference visual_feature_extractor.py:361,378 torch.roll)."""
    runs = []
    nWw = W // window
    N = window * window

    def idx(h, w):
        return ((h // window) * nWw + (w // window)) * N \
            + (h % window) * window + (w % window)

    for i in range(H // window):
        for j in range(nWw):
            for r in range(window):
                h_s = (i * window + r + shift) % H
                dst_base = (i * nWw + j) * N + r * window
                c = 0
                while c < window:
                    w_s = (j * window + c + shift) % W
                    run = 1
                    while c + run < window:
                        w_n = (j * window + c + run + shift) % W
                        if w_n != w_s + run \
                                or w_n // window != w_s // window:
                            break
                        run += 1
                    runs.append((dst_base + c, idx(h_s, w_s), run))
                    c += run
    return tuple(runs)


def _full_shift_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                       wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref,
                       b1_ref, w2_ref, b2_ref, bias_ref, mask_ref, o_ref,
                       ctx_ref, s_ref, *, scale: float, num_heads: int,
                       window_n: int, runs, img_rows: int, n_img: int,
                       mlp_chunks: int = 1, fast: bool = False):
    """Shifted (SW-MSA) whole block with the cyclic shift folded in: the
    input arrives in UNSHIFTED window-major layout; the kernel permutes to
    the shifted layout in VMEM (static run copies), runs the block, and
    writes back through the inverse permutation — no XLA roll/partition
    HBM passes for shifted blocks at all."""
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            s_ref[b0 + dst:b0 + dst + ln] = x_ref[b0 + src_:b0 + src_ + ln]
    X = s_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast,
                     mask_ref=mask_ref, mlp_chunks=mlp_chunks)
    outc = out.astype(o_ref.dtype)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            o_ref[b0 + src_:b0 + src_ + ln] = outc[b0 + dst:b0 + dst + ln]


def _full_kernel_dp(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                    wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref,
                    b1_ref, w2_ref, b2_ref, bias_ref, dp1_ref, dp2_ref,
                    o_ref, ctx_ref, *, scale: float, num_heads: int,
                    window_n: int, fast: bool = False):
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    X = x_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast,
                     dp1_ref=dp1_ref, dp2_ref=dp2_ref)
    o_ref[:] = out.astype(o_ref.dtype)


def _full_kernel_save(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                      wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref,
                      b1_ref, w2_ref, b2_ref, bias_ref, o_ref, qkv_ref,
                      ctx_ref, *, scale: float, num_heads: int,
                      window_n: int, fast: bool = False):
    """`_full_kernel` that additionally emits QKV and ctx residuals (both
    dt) for the store-residual backward — ctx_ref is an OUTPUT here."""
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    X = x_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast,
                     qkv_ref=qkv_ref)
    o_ref[:] = out.astype(o_ref.dtype)


def _full_kernel_dp_save(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                         wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref,
                         b1_ref, w2_ref, b2_ref, bias_ref, dp1_ref, dp2_ref,
                         o_ref, qkv_ref, ctx_ref, *, scale: float,
                         num_heads: int, window_n: int, fast: bool = False):
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    X = x_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast,
                     dp1_ref=dp1_ref, dp2_ref=dp2_ref, qkv_ref=qkv_ref)
    o_ref[:] = out.astype(o_ref.dtype)


def _full_kernel_save_p(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                        wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref,
                        b1_ref, w2_ref, b2_ref, bias_ref, o_ref, qkv_ref,
                        ctx_ref, p_ref, *, scale: float, num_heads: int,
                        window_n: int, fast: bool = False):
    """:func:`_full_kernel_save` that also emits the normalized softmax
    per (window, head) — enables the stored-p attention-core backward
    (wins at stage-3 geometry, num_heads >= 12)."""
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    X = x_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast,
                     qkv_ref=qkv_ref, p_ref=p_ref)
    o_ref[:] = out.astype(o_ref.dtype)


def _full_kernel_dp_save_p(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                           wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref,
                           b1_ref, w2_ref, b2_ref, bias_ref, dp1_ref,
                           dp2_ref, o_ref, qkv_ref, ctx_ref, p_ref, *,
                           scale: float, num_heads: int, window_n: int,
                           fast: bool = False):
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    X = x_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast,
                     dp1_ref=dp1_ref, dp2_ref=dp2_ref, qkv_ref=qkv_ref,
                     p_ref=p_ref)
    o_ref[:] = out.astype(o_ref.dtype)


def _full_shift_kernel_dp(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                          wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref,
                          b1_ref, w2_ref, b2_ref, bias_ref, mask_ref,
                          dp1_ref, dp2_ref, o_ref, ctx_ref, s_ref, *,
                          scale: float, num_heads: int,
                          window_n: int, runs, img_rows: int, n_img: int,
                          mlp_chunks: int = 1, fast: bool = False):
    """Shift-folded block with DropPath multipliers.  DropPath drops a
    whole residual branch PER IMAGE, so the dp vectors are constant
    across each image's ``img_rows`` rows — and since the shift
    permutation only moves rows within an image, permuting dp alongside
    x is the identity.  The multipliers are therefore used in place (no
    permuted scratches, no copy runs), which keeps the dp variant at the
    non-dp kernel's scoped-VMEM footprint."""
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            s_ref[b0 + dst:b0 + dst + ln] = x_ref[b0 + src_:b0 + src_ + ln]
    X = s_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast,
                     mask_ref=mask_ref, mlp_chunks=mlp_chunks,
                     dp1_ref=dp1_ref, dp2_ref=dp2_ref)
    outc = out.astype(o_ref.dtype)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            o_ref[b0 + src_:b0 + src_ + ln] = outc[b0 + dst:b0 + dst + ln]


def _full_shift_kernel_save(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                            wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
                            w1_ref, b1_ref, w2_ref, b2_ref, bias_ref,
                            mask_ref, o_ref, qkv_ref, ctx_ref, s_ref, *,
                            scale: float, num_heads: int, window_n: int,
                            runs, img_rows: int, n_img: int,
                            mlp_chunks: int = 1, fast: bool = False):
    """`_full_shift_kernel` that additionally emits QKV and ctx residuals.
    They stay in the SHIFTED window-major layout (only the block output is
    written back through the inverse permutation) — the store-residual
    backward permutes its cotangents instead."""
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            s_ref[b0 + dst:b0 + dst + ln] = x_ref[b0 + src_:b0 + src_ + ln]
    X = s_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast,
                     mask_ref=mask_ref, mlp_chunks=mlp_chunks,
                     qkv_ref=qkv_ref)
    outc = out.astype(o_ref.dtype)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            o_ref[b0 + src_:b0 + src_ + ln] = outc[b0 + dst:b0 + dst + ln]


def _full_shift_kernel_dp_save(x_ref, ln1s_ref, ln1b_ref, wqkv_ref,
                               bqkv_ref, wproj_ref, bproj_ref, ln2s_ref,
                               ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                               bias_ref, mask_ref, dp1_ref, dp2_ref, o_ref,
                               qkv_ref, ctx_ref, s_ref, *,
                               scale: float, num_heads: int, window_n: int,
                               runs, img_rows: int, n_img: int,
                               mlp_chunks: int = 1, fast: bool = False):
    """Store-residual variant of :func:`_full_shift_kernel_dp`; the same
    per-image-constant argument lets dp be used in place (unpermuted)."""
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            s_ref[b0 + dst:b0 + dst + ln] = x_ref[b0 + src_:b0 + src_ + ln]
    X = s_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast,
                     mask_ref=mask_ref, mlp_chunks=mlp_chunks,
                     dp1_ref=dp1_ref, dp2_ref=dp2_ref, qkv_ref=qkv_ref)
    outc = out.astype(o_ref.dtype)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            o_ref[b0 + src_:b0 + src_ + ln] = outc[b0 + dst:b0 + dst + ln]


def _full_shift_kernel_save_p(x_ref, ln1s_ref, ln1b_ref, wqkv_ref,
                              bqkv_ref, wproj_ref, bproj_ref, ln2s_ref,
                              ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                              bias_ref, mask_ref, o_ref, qkv_ref, ctx_ref,
                              p_ref, s_ref, *, scale: float, num_heads: int,
                              window_n: int, runs, img_rows: int,
                              n_img: int, mlp_chunks: int = 1,
                              fast: bool = False):
    """:func:`_full_shift_kernel_save` that also emits the normalized
    softmax per (merged window pair, head), in the SHIFTED layout the
    residuals already use — enables the stored-p attention-core backward
    on SW-MSA blocks (the shift permutation never touches p: it is a
    per-window quantity and the backward's cotangents are permuted into
    the same layout before :func:`attention_core_bwd_flat` runs)."""
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            s_ref[b0 + dst:b0 + dst + ln] = x_ref[b0 + src_:b0 + src_ + ln]
    X = s_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast,
                     mask_ref=mask_ref, mlp_chunks=mlp_chunks,
                     qkv_ref=qkv_ref, p_ref=p_ref)
    outc = out.astype(o_ref.dtype)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            o_ref[b0 + src_:b0 + src_ + ln] = outc[b0 + dst:b0 + dst + ln]


def _full_shift_kernel_dp_save_p(x_ref, ln1s_ref, ln1b_ref, wqkv_ref,
                                 bqkv_ref, wproj_ref, bproj_ref, ln2s_ref,
                                 ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                                 bias_ref, mask_ref, dp1_ref, dp2_ref,
                                 o_ref, qkv_ref, ctx_ref, p_ref, s_ref, *,
                                 scale: float, num_heads: int,
                                 window_n: int, runs, img_rows: int,
                                 n_img: int, mlp_chunks: int = 1,
                                 fast: bool = False):
    """Stored-p variant of :func:`_full_shift_kernel_dp_save` (DropPath
    multipliers in place, per-image constant)."""
    refs = (ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            s_ref[b0 + dst:b0 + dst + ln] = x_ref[b0 + src_:b0 + src_ + ln]
    X = s_ref[:].astype(jnp.float32)
    out = _full_body(X, x_ref.dtype, refs, bias_ref, ctx_ref, scale=scale,
                     num_heads=num_heads, window_n=window_n, fast=fast,
                     mask_ref=mask_ref, mlp_chunks=mlp_chunks,
                     dp1_ref=dp1_ref, dp2_ref=dp2_ref, qkv_ref=qkv_ref,
                     p_ref=p_ref)
    outc = out.astype(o_ref.dtype)
    for im in range(n_img):
        b0 = im * img_rows
        for dst, src_, ln in runs:
            o_ref[b0 + src_:b0 + src_ + ln] = outc[b0 + dst:b0 + dst + ln]


def shift_kernel_feasible(H: int, W: int, window: int, C: int,
                          batch: int, with_dp: bool = False) -> bool:
    """Whether the shift-folded whole-block kernel applies: programs must
    hold whole images (the roll wraps across the full map), fit the VMEM
    working set (the MLP chunks itself down to a ~3MB intermediate, and
    the shift mask ships head-independent in bf16), and keep the
    unrolled copy-run count sane."""
    LW = (H // window) * (W // window) * window * window
    if (H // window) * (W // window) % 2 != 0:   # pattern pairs must tile
        return False
    k = 1
    while (k * LW) % 8 != 0:
        k *= 2
    if batch % k != 0:
        return False
    # X f32 + QKV bf16 + ctx/s scratch + io blocks ~ 16 B per (row, chan);
    # chunked MLP intermediate adds a flat ~3MB.  Training (with_dp) runs
    # the store-residual variant whose qkv output block adds 6 B.
    if k * LW * C * (22 if with_dp else 16) + 3 * 1024 * 1024 \
            > 13 * 1024 * 1024:
        return False
    # Mosaic's scoped-VMEM accounting grows with very large grids in ways
    # this predicate cannot model (observed: b256 stage-1 compile OOM at
    # 17.05M with an identical per-program footprint that fits at b128);
    # cap the grid and let larger batches take the XLA roll path.
    if batch > 128:
        return False
    runs = len(_shift_runs(H, W, window, window // 2))
    # (the dp variant once permuted multipliers through scratch and was
    # VMEM-blocked at stage-1's 896 runs; DropPath multipliers are
    # per-image constants so the permutation is the identity — dp now
    # ships unpermuted and the dp calls carry an explicit 24MB scoped-
    # vmem margin, so the same runs cap applies with and without dp)
    return runs <= 1000


def _full_forward_shift(x, params, bias, *, scale, num_heads, interpret,
                        shift_spec, dp=None, save_res=False):
    """x: (BW, N, C) UNSHIFTED window-major.  ``bias`` is a tuple
    ``(rel, mask)``: per-head relative-position bias (1, nH, N, N) f32
    and head-independent shift-mask patterns (nWb, N, N) — shipped
    separately so the (nWb, 2N, 2N) merged mask is nH times smaller in
    VMEM than pre-combined patterns.  Requires
    :func:`shift_kernel_feasible`.

    ``save_res=True``: returns ``(out, qkv, ctx)``; the residuals are in
    the SHIFTED window-major layout, flat ``(BW*N, 3C)/(BW*N, C)``."""
    H, W, window, shift = shift_spec
    BW, N, C = x.shape
    nW = (H // window) * (W // window)
    B = BW // nW
    LW = nW * N
    k = 1
    while (k * LW) % 8 != 0:
        k *= 2
    runs = _shift_runs(H, W, window, shift)

    rel, mask = bias
    nH = rel.shape[1]
    N2 = 2 * N
    # merged rel: both diagonal blocks are the shared pattern; off-diag 0
    # (the merged MASK carries the -1e9 pair separation)
    rel_m = jnp.zeros((1, nH, N2, N2), jnp.float32)
    rel_m = rel_m.at[:, :, :N, :N].set(rel).at[:, :, N:, N:].set(rel)
    nWb = mask.shape[0]
    mk = mask.reshape(nWb // 2, 2, N, N)
    mask_m = jnp.full((nWb // 2, N2, N2), -1e9, jnp.float32)
    mask_m = mask_m.at[:, :N, :N].set(mk[:, 0]).at[:, N:, N:].set(mk[:, 1])
    mask_m = mask_m.astype(jnp.bfloat16 if x.dtype == jnp.bfloat16
                           else jnp.float32)

    mlp_chunks = 1
    rows = k * LW
    I = params[8].shape[-1]              # w1: (C, 4C)
    while mlp_chunks < 4 and rows * (I // mlp_chunks) * 4 > 3 * 1024 * 1024 \
            and (I // (mlp_chunks * 2)) % 128 == 0:
        mlp_chunks *= 2

    x2 = x.reshape(BW * N, C)
    grid = (B // k,)
    x_spec = pl.BlockSpec((rows, C), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    fast = x.dtype == jnp.bfloat16 and not interpret
    if save_res:
        qkv_spec = pl.BlockSpec((rows, 3 * C), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_specs = (x_spec, qkv_spec, x_spec)
        out_shape = (jax.ShapeDtypeStruct(x2.shape, x.dtype),
                     jax.ShapeDtypeStruct((BW * N, 3 * C), x.dtype),
                     jax.ShapeDtypeStruct(x2.shape, x.dtype))
        # stored-p backward on the shift path: same opt-in + geometry
        # gate as _full_forward_inner (>=12 heads = stage-3+; the merged
        # (2N, 2N) tile must fit the storep kernel's 128-lane check).
        # p stays in the SHIFTED merged-pair layout — exactly what
        # attention_core_bwd_flat's p2 path expects after the backward
        # permutes its cotangents into that layout.
        store_p = (num_heads >= 12 and N2 <= 128
                   and env_flag("MVLT_STOREP")
                   and not env_flag("MVLT_NO_STOREP"))
        if store_p:
            p_spec = pl.BlockSpec((rows // N2 * num_heads, N2, N2),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
            out_specs = out_specs + (p_spec,)
            out_shape = out_shape + (jax.ShapeDtypeStruct(
                (BW * N // N2 * num_heads, N2, N2), x.dtype),)
        p = None
        if dp is not None:
            dp_spec = pl.BlockSpec((rows, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
            res = pl.pallas_call(
                functools.partial(
                    _full_shift_kernel_dp_save_p if store_p
                    else _full_shift_kernel_dp_save, scale=scale,
                    num_heads=num_heads, window_n=N2, runs=runs,
                    img_rows=LW, n_img=k, mlp_chunks=mlp_chunks,
                    fast=fast),
                grid=grid,
                in_specs=[x_spec] + [const_spec(p.shape) for p in params]
                + [const_spec(rel_m.shape), const_spec(mask_m.shape),
                   dp_spec, dp_spec],
                out_specs=out_specs, out_shape=out_shape,
                scratch_shapes=[pltpu.VMEM((rows, C), x.dtype)],
                interpret=interpret,
                # stage-1 geometry (896 runs) sits just over the 16MB
                # default scoped-vmem accounting (observed 18.3M when the
                # surrounding jit keeps extra buffers resident) — give the
                # margin explicitly rather than losing the fold.
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=32 * 1024 * 1024),
            )(x2, *params, rel_m, mask_m, dp[0], dp[1])
        else:
            res = pl.pallas_call(
                functools.partial(
                    _full_shift_kernel_save_p if store_p
                    else _full_shift_kernel_save, scale=scale,
                    num_heads=num_heads, window_n=N2, runs=runs,
                    img_rows=LW, n_img=k, mlp_chunks=mlp_chunks,
                    fast=fast),
                grid=grid,
                in_specs=[x_spec] + [const_spec(p.shape) for p in params]
                + [const_spec(rel_m.shape), const_spec(mask_m.shape)],
                out_specs=out_specs, out_shape=out_shape,
                scratch_shapes=[pltpu.VMEM((rows, C), x.dtype)],
                interpret=interpret,
                # same stage-1 margin as the dp variants: grad-of-
                # deterministic routes here and was observed 309K over
                # the 16MB default accounting under jvp.
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=32 * 1024 * 1024),
            )(x2, *params, rel_m, mask_m)
        if store_p:
            out, qkv, ctx, p = res
        else:
            out, qkv, ctx = res
        return out.reshape(BW, N, C), qkv, ctx, p
    if dp is not None:
        dp_spec = pl.BlockSpec((rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(
                _full_shift_kernel_dp, scale=scale, num_heads=num_heads,
                window_n=N2, runs=runs, img_rows=LW, n_img=k,
                mlp_chunks=mlp_chunks, fast=fast),
            grid=grid,
            in_specs=[x_spec] + [const_spec(p.shape) for p in params]
            + [const_spec(rel_m.shape), const_spec(mask_m.shape),
               dp_spec, dp_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
            scratch_shapes=[pltpu.VMEM((rows, C), x.dtype),
                            pltpu.VMEM((rows, C), x.dtype)],
            interpret=interpret,
            # see the dp_save variant above: explicit margin over the
            # 16MB default for stage-1's 896-run fold
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
        )(x2, *params, rel_m, mask_m, dp[0], dp[1])
        return out.reshape(BW, N, C)
    out = pl.pallas_call(
        functools.partial(
            _full_shift_kernel, scale=scale, num_heads=num_heads,
            window_n=N2, runs=runs, img_rows=LW, n_img=k,
            mlp_chunks=mlp_chunks, fast=fast),
        grid=grid,
        in_specs=[x_spec] + [const_spec(p.shape) for p in params]
        + [const_spec(rel_m.shape), const_spec(mask_m.shape)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((rows, C), x.dtype),
                        pltpu.VMEM((rows, C), x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(x2, *params, rel_m, mask_m)
    return out.reshape(BW, N, C)


def _full_kernel_windows(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                         wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref,
                         b1_ref, w2_ref, b2_ref, bias_ref, o_ref, ctx_ref, *,
                         scale: float, num_heads: int, fast: bool = False):
    """3-D fallback: per-window dots (used when G*N can't be 8-aligned,
    e.g. shifted stage-3 blocks where nWb=4 and N=49)."""
    G, N, C = x_ref.shape
    Gb = bias_ref.shape[0]
    Dh = C // num_heads

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    for g in range(G):
        xf = x_ref[g].astype(jnp.float32)
        h = _ln(xf, ln1s_ref[:], ln1b_ref[:])
        rows = dot(h.astype(x_ref.dtype), wqkv_ref[:])
        rows = (rows + bqkv_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
        for hh in range(num_heads):
            q = rows[:, hh * Dh:(hh + 1) * Dh].astype(jnp.float32) * scale
            k = rows[:, C + hh * Dh:C + (hh + 1) * Dh].astype(jnp.float32)
            v = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + bias_ref[g % Gb, hh]
            p = _softmax_rows(s, fast)
            ctx = jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            ctx_ref[g, :, hh * Dh:(hh + 1) * Dh] = ctx.astype(ctx_ref.dtype)

    for g in range(G):
        xf = x_ref[g].astype(jnp.float32)
        attn = dot(ctx_ref[g], wproj_ref[:])
        res1 = xf + attn + bproj_ref[:].astype(jnp.float32)
        h2 = _ln(res1, ln2s_ref[:], ln2b_ref[:])
        m = dot(h2.astype(x_ref.dtype), w1_ref[:])
        m = m + b1_ref[:].astype(jnp.float32)
        m = _gelu_exact(m, fast)
        mlp = dot(m.astype(x_ref.dtype), w2_ref[:])
        o_ref[g] = (res1 + mlp
                    + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _full_forward_windows(x, params, bias, *, scale, num_heads, group,
                          interpret):
    """3-D per-window grid (fallback path)."""
    BW, N, C = x.shape
    nWb = bias.shape[0]
    G = group
    while BW % G != 0 or (nWb > 1 and nWb % G != 0):
        G //= 2
    G = max(G, 1)

    if nWb > 1:
        B = BW // nWb
        grid = (nWb // G, B)
        x_map = lambda i_w, i_b: (i_b * (nWb // G) + i_w, 0, 0)
        nargs = 2
        bias_spec = pl.BlockSpec((G, num_heads, N, N),
                                 lambda i_w, i_b: (i_w, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        grid = (BW // G,)
        x_map = lambda i: (i, 0, 0)
        nargs = 1
        bias_spec = pl.BlockSpec((1, num_heads, N, N), lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    def const_spec(shape):
        zero = (lambda i_w, i_b: (0,) * len(shape)) if nargs == 2 else \
            (lambda i: (0,) * len(shape))
        return pl.BlockSpec(shape, zero, memory_space=pltpu.VMEM)

    x_spec = pl.BlockSpec((G, N, C), x_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_full_kernel_windows, scale=scale,
                          num_heads=num_heads,
                          fast=(x.dtype == jnp.bfloat16 and not interpret)),
        grid=grid,
        in_specs=[x_spec] + [const_spec(p.shape) for p in params]
        + [bias_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((G, N, C), x.dtype)],
        interpret=interpret,
    )(x, *params, bias)


def _full_forward(x, params, bias, *, scale, num_heads, group, interpret,
                  dp=None, save_res=False):
    """params: tuple (ln1s, ln1b, wqkv, bqkv, wproj, bproj, ln2s, ln2b,
    w1, b1, w2, b2).  x: (BW, N, C) windows.

    Adjacent windows are first paired into block-diagonal (2N, 2N)
    attention groups when N <= 64 (fills the 128-lane tile; numerically
    exact — see :func:`_merge_window_pairs`), then the kernel prefers the
    2-D (G*N, C) layout (big MXU dots) when a group size G exists with
    G*N % 8 == 0 (Mosaic block constraint), G | BW and G | nWb; otherwise
    it pads N to a multiple of 8 or falls back to the per-window 3-D
    kernel.

    ``save_res=True`` returns ``(out, qkv, ctx)`` — the in-kernel QKV
    and attention-context residuals for the store-residual backward, in
    FLAT ``(BW*N, 3C)/(BW*N, C)`` layout (same row order as the caller's
    windows; merging is a pure reshape of flat rows) — or
    ``(out, None, None)`` on fallback paths that don't support saving."""
    orig_shape = x.shape
    x, bias, merged = _merge_window_pairs(x, bias)
    out = _full_forward_inner(x, params, bias, scale=scale,
                              num_heads=num_heads, group=group,
                              interpret=interpret, dp=dp,
                              save_res=save_res)
    if save_res:
        out, qkv, ctx, p = out
        if merged:
            out = out.reshape(orig_shape)
        # qkv/ctx stay FLAT (BW*N, ·): the stored backward consumes flat
        # rows (attention_core_bwd_flat) and a (BW, N, ·) tiled array at
        # N % 8 != 0 would force a real relayout copy both ways; p (when
        # stored) is already per-MERGED-window-head (BWm*nH, N, N)
        return out, qkv, ctx, p
    return out.reshape(orig_shape) if merged else out


_DEFAULT_VMEM_CAP = 8 * 1024 * 1024
_warned_group_override = False


def _vmem_cap() -> int:
    # read per call (trace time) so MVLT_VMEM_CAP set after import works
    return env_int("MVLT_VMEM_CAP", _DEFAULT_VMEM_CAP)


def _full_forward_inner(x, params, bias, *, scale, num_heads, group,
                        interpret, dp=None, save_res=False):
    BW, N, C = x.shape
    nWb = bias.shape[0]
    G = env_int("MVLT_GROUP", group)
    if G != group:
        # debug-only override: it retiles EVERY stage's kernel, so make
        # the change loud (once) instead of silently shifting production
        global _warned_group_override
        if not _warned_group_override:
            _warned_group_override = True
            import warnings
            warnings.warn(
                f"MVLT_GROUP={G} overrides caller group={group} for ALL "
                "_full_forward_inner call sites (debug knob)")
    # stored-p backward: OPT-IN (MVLT_STOREP=1).  The isolated core-bwd
    # kernel wins at stage-3 geometry (0.43 -> 0.34 ms, probe_core_p.py)
    # but at STEP level the ~127 MB of live p residuals between forward
    # and backward cost more than the recompute they avoid (measured
    # 72.1 -> 75.2 ms/step chained) — memory pressure a single-block
    # probe cannot see.  Kept as tested infrastructure for larger-VMEM /
    # higher-head-count deployments.
    store_p = (save_res and num_heads >= 12 and N <= 128
               and env_flag("MVLT_STOREP")
               and not env_flag("MVLT_NO_STOREP"))
    # VMEM budget: the dominant in-kernel value is the (G*N, 4C) f32 MLP
    # intermediate; cap it (plus qkv + x blocks, and the qkv/ctx [+ p]
    # output blocks of the store-residual mode) around ~8MB
    p_row = num_heads * N * x.dtype.itemsize if store_p else 0
    row_bytes = (4 + 3 + 4) * 4 + (8 if save_res else 0)
    while G > 1 and G * N * (C * row_bytes + p_row) > _vmem_cap():
        G //= 2
    while G > 1 and (BW % G != 0 or (nWb > 1 and nWb % G != 0)
                     or (G * N) % 8 != 0):
        G //= 2
    if (G * N) % 8 != 0 or BW % G != 0 or (nWb > 1 and nWb % G != 0):
        if dp is not None:
            # awkward geometry + stochastic depth: XLA composition with
            # the Pallas attention core (correct, still kernel-fast on
            # the core; the fused fallbacks below don't thread dp)
            out = _full_ref_fastcore(x, params, bias, dp, scale,
                                     num_heads, interpret)
            return (out, None, None, None) if save_res else out
        # No 8-aligned G exists (e.g. shifted stage-3: nWb=4, N=49 odd).
        # Pad windows to the next multiple of 8 rows so the 2-D big-dot
        # path still applies: padded KEYS are masked with a large negative
        # bias; padded QUERY rows produce garbage that is sliced off.
        N_pad = -(-N // 8) * 8
        if N_pad != N and N_pad * bias.shape[1] > 0:
            x_p = jnp.pad(x, ((0, 0), (0, N_pad - N), (0, 0)))
            bias_p = jnp.pad(bias,
                             ((0, 0), (0, 0), (0, N_pad - N), (0, 0)))
            bias_p = jnp.pad(bias_p,
                             ((0, 0), (0, 0), (0, 0), (0, N_pad - N)),
                             constant_values=-1e9)
            out = _full_forward(x_p, params, bias_p, scale=scale,
                                num_heads=num_heads, group=group,
                                interpret=interpret)
            out = out[:, :N]
            return (out, None, None, None) if save_res else out
        out = _full_forward_windows(x, params, bias, scale=scale,
                                    num_heads=num_heads, group=group,
                                    interpret=interpret)
        return (out, None, None, None) if save_res else out

    x2 = x.reshape(BW * N, C)      # XLA-side reshape (contiguous, free-ish)

    if nWb > 1:
        B = BW // nWb
        grid = (nWb // G, B)
        x_map = lambda i_w, i_b: (i_b * (nWb // G) + i_w, 0)
        nargs = 2
        bias_spec = pl.BlockSpec((G, num_heads, N, N),
                                 lambda i_w, i_b: (i_w, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        grid = (BW // G,)
        x_map = lambda i: (i, 0)
        nargs = 1
        bias_spec = pl.BlockSpec((1, num_heads, N, N), lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    def const_spec(shape):
        zero = (lambda i_w, i_b: (0,) * len(shape)) if nargs == 2 else \
            (lambda i: (0,) * len(shape))
        return pl.BlockSpec(shape, zero, memory_space=pltpu.VMEM)

    x_spec = pl.BlockSpec((G * N, C), x_map, memory_space=pltpu.VMEM)
    fast = x.dtype == jnp.bfloat16 and not interpret
    if save_res:
        qkv_spec = pl.BlockSpec((G * N, 3 * C), x_map,
                                memory_space=pltpu.VMEM)
        out_specs = (x_spec, qkv_spec, x_spec)
        out_shape = (jax.ShapeDtypeStruct(x2.shape, x.dtype),
                     jax.ShapeDtypeStruct((BW * N, 3 * C), x.dtype),
                     jax.ShapeDtypeStruct(x2.shape, x.dtype))
        if store_p:
            if nargs == 2:
                p_map = lambda i_w, i_b: (i_b * (nWb // G) + i_w, 0, 0)
            else:
                p_map = lambda i: (i, 0, 0)
            out_specs = out_specs + (pl.BlockSpec(
                (G * num_heads, N, N), p_map, memory_space=pltpu.VMEM),)
            out_shape = out_shape + (jax.ShapeDtypeStruct(
                (BW * num_heads, N, N), x.dtype),)
        kern_dp = _full_kernel_dp_save_p if store_p else _full_kernel_dp_save
        kern = _full_kernel_save_p if store_p else _full_kernel_save
        if dp is not None:
            dp_spec = pl.BlockSpec((G * N, 1), x_map,
                                   memory_space=pltpu.VMEM)
            res = pl.pallas_call(
                functools.partial(
                    kern_dp, scale=scale,
                    num_heads=num_heads, window_n=N, fast=fast),
                grid=grid,
                in_specs=[x_spec] + [const_spec(p.shape) for p in params]
                + [bias_spec, dp_spec, dp_spec],
                out_specs=out_specs, out_shape=out_shape,
                interpret=interpret,
            )(x2, *params, bias, dp[0], dp[1])
        else:
            res = pl.pallas_call(
                functools.partial(
                    kern, scale=scale, num_heads=num_heads,
                    window_n=N, fast=fast),
                grid=grid,
                in_specs=[x_spec] + [const_spec(p.shape) for p in params]
                + [bias_spec],
                out_specs=out_specs, out_shape=out_shape,
                interpret=interpret,
            )(x2, *params, bias)
        out, qkv, ctx = res[:3]
        p_out = res[3] if store_p else None
        return out.reshape(BW, N, C), qkv, ctx, p_out
    if dp is not None:
        dp_spec = pl.BlockSpec((G * N, 1), x_map, memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(
                _full_kernel_dp, scale=scale, num_heads=num_heads,
                window_n=N, fast=fast),
            grid=grid,
            in_specs=[x_spec] + [const_spec(p.shape) for p in params]
            + [bias_spec, dp_spec, dp_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
            scratch_shapes=[pltpu.VMEM((G * N, C), x.dtype)],
            interpret=interpret,
        )(x2, *params, bias, dp[0], dp[1])
        return out.reshape(BW, N, C)
    out = pl.pallas_call(
        functools.partial(_full_kernel, scale=scale, num_heads=num_heads,
                          window_n=N, fast=fast),
        grid=grid,
        in_specs=[x_spec] + [const_spec(p.shape) for p in params]
        + [bias_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((G * N, C), x.dtype)],
        interpret=interpret,
    )(x2, *params, bias)
    return out.reshape(BW, N, C)


def _full_xla_ref(x, params, bias, scale, num_heads):
    ln1s, ln1b, wqkv, bqkv, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2 = params
    xf = x.astype(jnp.float32)
    h = _ln(xf, ln1s, ln1b).astype(x.dtype)
    attn = _block_xla_ref(h, wqkv, bqkv, wproj, bproj, bias, scale,
                          num_heads).astype(jnp.float32)
    res1 = xf + attn
    h2 = _ln(res1, ln2s, ln2b).astype(x.dtype)
    m = jax.nn.gelu(
        (h2.reshape(-1, x.shape[-1]) @ w1).astype(jnp.float32)
        + b1, approximate=False)
    mlp = (m.astype(x.dtype) @ w2).astype(jnp.float32) + b2
    return (res1 + mlp.reshape(res1.shape)).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _shift_perm(H, W, window, shift):
    """Dense permutation (dst -> src) equivalent of :func:`_shift_runs`."""
    import numpy as _np
    LW = (H // window) * (W // window) * window * window
    perm = _np.zeros(LW, _np.int32)
    for dst, src, ln in _shift_runs(H, W, window, shift):
        perm[dst:dst + ln] = _np.arange(src, src + ln)
    return perm


def _full_xla_ref_shift(x, params, bias, scale, num_heads, shift_spec):
    """XLA reference of the shift-folded block: permute to the shifted
    window layout, run the block, permute back.  ``bias`` is the
    (rel, mask) tuple of :func:`_full_forward_shift`."""
    H, W, window, shift = shift_spec
    BW, N, C = x.shape
    nW = (H // window) * (W // window)
    rel, mask = bias
    combined = rel + mask[:, None]
    perm = jnp.asarray(_shift_perm(H, W, window, shift))
    xi = x.reshape(-1, nW * N, C)
    xs = jnp.take(xi, perm, axis=1).reshape(BW, N, C)
    y = _full_xla_ref(xs, params, combined, scale, num_heads)
    yi = y.reshape(-1, nW * N, C)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))
    return jnp.take(yi, inv, axis=1).reshape(BW, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def swin_full_block(x, params, bias, scale: float, num_heads: int,
                    group: int = 16, interpret: bool = False,
                    shift_spec=None, dp=None):
    """Whole Swin block fused. x: (BW, N, C) RAW windows (pre-LN);
    params as in :func:`_full_forward`.

    With ``shift_spec=(H, W, window, shift)`` the input must be in
    UNSHIFTED window-major layout; the cyclic shift is folded into the
    kernel (caller must check :func:`shift_kernel_feasible`).

    ``dp``: optional ((BW*N, 1), (BW*N, 1)) f32 per-row DropPath
    multipliers (0 or 1/keep) for the attention and MLP branches — lets
    stochastic-depth TRAINING forwards use the fused kernel.  Backward
    recomputes via the fast-core XLA composition (Pallas attention-core
    VJP + XLA matmuls).  With ``shift_spec`` the multipliers must be
    PER-IMAGE CONSTANT (true of DropPath by definition — it drops whole
    residual branches per sample): the shift fold then uses them in
    place instead of permuting them through scratch."""
    if shift_spec is not None:
        return _full_forward_shift(x, tuple(params), bias, scale=scale,
                                   num_heads=num_heads, interpret=interpret,
                                   shift_spec=shift_spec, dp=dp)
    return _full_forward(x, tuple(params), bias, scale=scale,
                         num_heads=num_heads, group=group,
                         interpret=interpret, dp=dp)


def _full_fwd(x, params, bias, scale, num_heads, group, interpret,
              shift_spec=None, dp=None):
    if shift_spec is None:
        # store-residual mode: the kernel additionally emits QKV/ctx so
        # the backward skips the whole-forward recompute (qkv is None on
        # fallback paths that don't support saving)
        out, qkv, ctx, p = _full_forward(x, tuple(params), bias,
                                         scale=scale, num_heads=num_heads,
                                         group=group, interpret=interpret,
                                         dp=dp, save_res=True)
    else:
        # the save-residual shift variant carries the qkv output block on
        # top of the inference footprint — re-check feasibility with the
        # with_dp (save-path) accounting even when dp is None (training
        # with drop_path=0); on failure run the lean forward and let the
        # backward recompute via the fastcore fallback (qkv=None path)
        H, W, window, _shift = shift_spec
        BW, N, C = x.shape
        nW = (H // window) * (W // window)
        if dp is not None or shift_kernel_feasible(
                H, W, window, C, BW // nW, with_dp=True):
            out, qkv, ctx, p = _full_forward_shift(
                x, tuple(params), bias, scale=scale, num_heads=num_heads,
                interpret=interpret, shift_spec=shift_spec, dp=dp,
                save_res=True)
        else:
            out = _full_forward_shift(
                x, tuple(params), bias, scale=scale, num_heads=num_heads,
                interpret=interpret, shift_spec=shift_spec, dp=dp)
            qkv = ctx = p = None
    return out, (x, tuple(params), bias, dp, qkv, ctx, p)


def _full_bwd_stored(scale, num_heads, interpret, res, g):
    x, params, bias, dp, qkv, ctx, p = res
    interp = interpret or jax.default_backend() != "tpu"
    return _stored_block_bwd(x, params, bias, dp, qkv, ctx, g, scale,
                             num_heads, interp, p=p)


def _dot(a, b):                         # (R, K) @ (K, L), f32 accumulate
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t(a, b):                       # (R, K) @ (L, K)^T
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_rows(a, b):                    # (R, K)^T @ (R, L)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mxu_sums(R, C):
    """(rowsum, colsum) reducers as MXU ones-matvecs (the VPU lane
    reduction tree moves to the otherwise idle MXU)."""
    ones_c = jnp.ones((C, 1), jnp.float32)
    ones_r = jnp.ones((R, 1), jnp.float32)

    def rowsum(a):                      # (R, C) -> (R, 1)
        return jax.lax.dot_general(a, ones_c, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def colsum(a):                      # (R, K) -> (1, K)
        return jax.lax.dot_general(ones_r, a, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    return rowsum, colsum


def _gelu_grad(a, fast: bool):
    """(gelu(a), gelu'(a)) in f32, matching :func:`_gelu_exact`'s two
    formulations (tanh fast path / A&S-rational-erf exact path)."""
    if fast:
        u = 0.7978845608028654 * (a + 0.044715 * a * a * a)
        t = jnp.tanh(u)
        du = 0.7978845608028654 * (1.0 + 0.134145 * a * a)
        return 0.5 * a * (1.0 + t), \
            0.5 * (1.0 + t) + 0.5 * a * (1.0 - t * t) * du
    Phi = 0.5 * (1.0 + _erf_approx(a * 0.7071067811865476))
    phi = jnp.exp(-0.5 * a * a) * 0.3989422804014327
    return a * Phi, Phi + a * phi


def _swin_mlp_bwd_kernel(x_ref, ctx_ref, g_ref, wproj_ref, bproj_ref,
                         ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
                         b2_ref, *rest, eps: float, fast: bool,
                         has_dp: bool):
    """Backward of the pre-LN Swin MLP half (+ res1/attn recompute) on a
    row chunk, with weight-grad accumulation across the sequential grid.

    The XLA formulation materializes ~5 (M, 4C) f32 intermediates
    (pre-GELU, GELU value/derivative, cotangents) through HBM — ~150 MB
    each at stage-1 geometry.  Here they live and die in VMEM; HBM sees
    one read of x/ctx/g (+dp) and one f32 write of dres1 (+ddp).

    Rows are independent (DropPath multipliers are per-row inputs), so
    the grid just chunks the flattened (BW*N, C) row dim — no window
    structure.  Emits dres1 = d(loss)/d(res1) for the attention tail,
    ddp1 = rowsum(dres1 * attn_nodp) and ddp2 = rowsum(g * mlp_nodp)."""
    rest = list(rest)
    dp1_ref = rest.pop(0) if has_dp else None
    dp2_ref = rest.pop(0) if has_dp else None
    if has_dp:
        (dres1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dln2s_ref,
         dln2b_ref, ddp1_ref, ddp2_ref) = rest
    else:
        (dres1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dln2s_ref,
         dln2b_ref) = rest

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dln2s_ref[...] = jnp.zeros_like(dln2s_ref)
        dln2b_ref[...] = jnp.zeros_like(dln2b_ref)

    R, C = x_ref.shape
    dt = x_ref.dtype
    rowsum, colsum = _mxu_sums(R, C)
    dot, dot_t, dot_rows = _dot, _dot_t, _dot_rows

    xf = x_ref[:].astype(jnp.float32)
    gf = g_ref[:].astype(jnp.float32)

    # res1 recompute from the saved ctx (one C^2 matmul)
    attn_nodp = dot(ctx_ref[:], wproj_ref[:]) \
        + bproj_ref[:].astype(jnp.float32)
    if has_dp:
        res1 = xf + attn_nodp * dp1_ref[:]
    else:
        res1 = xf + attn_nodp

    # LN2 recompute with stats kept for the backward
    mu = rowsum(res1) * (1.0 / C)
    var = rowsum(res1 * res1) * (1.0 / C) - mu * mu
    r = jax.lax.rsqrt(var + eps)
    xhat = (res1 - mu) * r
    s2 = ln2s_ref[:].astype(jnp.float32)
    h2 = xhat * s2 + ln2b_ref[:].astype(jnp.float32)
    h2d = h2.astype(dt)

    a1 = dot(h2d, w1_ref[:]) + b1_ref[:].astype(jnp.float32)
    m, dg = _gelu_grad(a1, fast)
    md = m.astype(dt)

    if has_dp:
        mlp_nodp = dot(md, w2_ref[:]) + b2_ref[:].astype(jnp.float32)
        ddp2_ref[:] = rowsum(gf * mlp_nodp)
        dmlp = gf * dp2_ref[:]
    else:
        dmlp = gf
    dmlp_d = dmlp.astype(dt)
    dw2_ref[...] += dot_rows(md, dmlp_d)
    db2_ref[...] += colsum(dmlp)
    dm = dot_t(dmlp_d, w2_ref[:])                   # (R, 4C)
    da1 = dm * dg
    da1_d = da1.astype(dt)
    dw1_ref[...] += dot_rows(h2d, da1_d)
    db1_ref[...] += colsum(da1)
    dh2 = dot_t(da1_d, w1_ref[:])                   # (R, C) f32

    # LN2 backward from the recomputed stats
    dxhat = dh2 * s2
    mdx = rowsum(dxhat) * (1.0 / C)
    mdxx = rowsum(dxhat * xhat) * (1.0 / C)
    dres1_ln = r * (dxhat - mdx - xhat * mdxx)
    dln2s_ref[...] += colsum(dh2 * xhat)
    dln2b_ref[...] += colsum(dh2)

    dres1 = gf + dres1_ln
    if has_dp:
        ddp1_ref[:] = rowsum(dres1 * attn_nodp)
    dres1_ref[:] = dres1


def swin_mlp_half_bwd(x2, ctx2, g2, wproj, bproj, ln2s, ln2b, w1, b1, w2,
                      b2, dp, eps: float = 1e-5, interpret: bool = False):
    """Fused backward of the Swin block's MLP half (incl. the res1/
    attn_nodp recompute and LN2 vjp) over flattened rows.

    x2/ctx2/g2: (M, C) in compute dtype; dp: ((M, 1), (M, 1)) f32
    DropPath multipliers or None.  Returns ``(dres1 (M, C) f32, dw1, db1,
    dw2, db2, dln2s, dln2b, ddp1, ddp2)`` with weight grads f32 and ddp*
    None when dp is None."""
    M, C = x2.shape
    H = w1.shape[1]
    # row chunk: ~5 (R, 4C) f32 intermediates live at once; target <=4MB
    R = 1 << max(6, (49152 // max(C, 1)).bit_length() - 1)
    while R > 8 and (M % R != 0 or R * H * 4 * 5 > 6 * 1024 * 1024):
        R //= 2
    if M % R != 0:
        raise ValueError(f"row count {M} not divisible by chunk {R} "
                         "(callers must pad rows to a multiple of 8)")

    grid = (M // R,)
    row_spec = lambda c: pl.BlockSpec((R, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    acc_spec = const_spec

    b_row = lambda a: a.reshape(1, -1)
    in_specs = [row_spec(C), row_spec(C), row_spec(C),
                const_spec(wproj.shape), const_spec((1, C)),
                const_spec((1, C)), const_spec((1, C)),
                const_spec(w1.shape), const_spec((1, H)),
                const_spec(w2.shape), const_spec((1, C))]
    operands = [x2, ctx2, g2, wproj, b_row(bproj), b_row(ln2s),
                b_row(ln2b), w1, b_row(b1), w2, b_row(b2)]
    if dp is not None:
        in_specs += [row_spec(1), row_spec(1)]
        operands += [dp[0], dp[1]]

    out_specs = [row_spec(C), acc_spec(w1.shape), acc_spec((1, H)),
                 acc_spec(w2.shape), acc_spec((1, C)), acc_spec((1, C)),
                 acc_spec((1, C))]
    out_shape = [jax.ShapeDtypeStruct((M, C), jnp.float32),
                 jax.ShapeDtypeStruct(w1.shape, jnp.float32),
                 jax.ShapeDtypeStruct((1, H), jnp.float32),
                 jax.ShapeDtypeStruct(w2.shape, jnp.float32),
                 jax.ShapeDtypeStruct((1, C), jnp.float32),
                 jax.ShapeDtypeStruct((1, C), jnp.float32),
                 jax.ShapeDtypeStruct((1, C), jnp.float32)]
    if dp is not None:
        out_specs += [row_spec(1), row_spec(1)]
        out_shape += [jax.ShapeDtypeStruct((M, 1), jnp.float32),
                      jax.ShapeDtypeStruct((M, 1), jnp.float32)]

    outs = pl.pallas_call(
        functools.partial(
            _swin_mlp_bwd_kernel, eps=eps,
            fast=(x2.dtype == jnp.bfloat16 and not interpret),
            has_dp=dp is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*operands)
    dres1, dw1, db1, dw2, db2, dln2s, dln2b = outs[:7]
    ddp1 = ddp2 = None
    if dp is not None:
        ddp1, ddp2 = outs[7], outs[8]
    return (dres1, dw1, db1.reshape(-1), dw2, db2.reshape(-1),
            dln2s.reshape(-1), dln2b.reshape(-1), ddp1, ddp2)


def _swin_qkv_tail_kernel(x_ref, dqkv_ref, dres1_ref, wqkv_ref, ln1s_ref,
                          ln1b_ref, dx_ref, dwqkv_ref, dbqkv_ref,
                          dln1s_ref, dln1b_ref, *, eps: float):
    """Backward tail of the pre-LN Swin block's attention half on a row
    chunk: LN1 recompute + vjp and the qkv-projection weight/input grads,
    with weight-grad accumulation across the sequential grid.

    The XLA formulation pays several (M, C)/(M, 3C) f32 elementwise
    passes through HBM (LN1 recompute, its vjp chain, dtype casts); here
    they stay in VMEM around the two MXU matmuls."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dln1s_ref[...] = jnp.zeros_like(dln1s_ref)
        dln1b_ref[...] = jnp.zeros_like(dln1b_ref)

    R, C = x_ref.shape
    dt = x_ref.dtype
    rowsum, colsum = _mxu_sums(R, C)
    dot_t, dot_rows = _dot_t, _dot_rows

    xf = x_ref[:].astype(jnp.float32)
    mu = rowsum(xf) * (1.0 / C)
    var = rowsum(xf * xf) * (1.0 / C) - mu * mu
    r = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * r
    s1 = ln1s_ref[:].astype(jnp.float32)
    # h1 = LN1(x) in dt for the weight-grad matmul (matches forward)
    h1d = (xhat * s1 + ln1b_ref[:].astype(jnp.float32)).astype(dt)

    dqkv_d = dqkv_ref[:].astype(dt)
    dwqkv_ref[...] += dot_rows(h1d, dqkv_d)
    dbqkv_ref[...] += colsum(dqkv_ref[:].astype(jnp.float32))
    dh1 = dot_t(dqkv_d, wqkv_ref[:])    # (R, C) f32

    dxhat = dh1 * s1
    mdx = rowsum(dxhat) * (1.0 / C)
    mdxx = rowsum(dxhat * xhat) * (1.0 / C)
    dx_ln = r * (dxhat - mdx - xhat * mdxx)
    dln1s_ref[...] += colsum(dh1 * xhat)
    dln1b_ref[...] += colsum(dh1)

    dx_ref[:] = (dres1_ref[:] + dx_ln).astype(dx_ref.dtype)


def swin_qkv_tail_bwd(x2, dqkv2, dres1, wqkv, ln1s, ln1b,
                      eps: float = 1e-5, interpret: bool = False):
    """Fused backward of the qkv head of the pre-LN Swin block.

    x2: (M, C) dt; dqkv2: (M, 3C) any float; dres1: (M, C) f32.
    Returns ``(dx (M, C) dt, dwqkv, dbqkv, dln1s, dln1b)`` f32 grads."""
    M, C = x2.shape
    C3 = dqkv2.shape[1]
    R = 1 << max(6, (49152 // max(C, 1)).bit_length() - 1)
    while R > 8 and M % R != 0:
        R //= 2
    if M % R != 0:
        raise ValueError(f"row count {M} not divisible by chunk {R} "
                         "(callers must pad rows to a multiple of 8)")

    grid = (M // R,)
    row_spec = lambda c: pl.BlockSpec((R, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_swin_qkv_tail_kernel, eps=eps),
        grid=grid,
        in_specs=[row_spec(C), row_spec(C3), row_spec(C),
                  const_spec(wqkv.shape), const_spec((1, C)),
                  const_spec((1, C))],
        out_specs=(row_spec(C), const_spec(wqkv.shape),
                   const_spec((1, C3)), const_spec((1, C)),
                   const_spec((1, C))),
        out_shape=(jax.ShapeDtypeStruct((M, C), x2.dtype),
                   jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, C3), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)),
        interpret=interpret,
    )(x2, dqkv2, dres1, wqkv, ln1s.reshape(1, -1), ln1b.reshape(1, -1))
    dx, dwqkv, dbqkv, dln1s, dln1b = outs
    return (dx, dwqkv, dbqkv.reshape(-1), dln1s.reshape(-1),
            dln1b.reshape(-1))


def _stored_block_bwd(x, params, bias, dp, qkv, ctx, g, scale, num_heads,
                      interp, p=None):
    """Store-residual backward of the whole Swin block.

    Consumes the forward kernel's QKV and ctx (FLAT (BW*N, ·) layout)
    instead of recomputing the block: the only recompute left is LN1/LN2
    (elementwise) and fc1+GELU (one matmul, needed for the GELU
    derivative); the attention core backward runs as a Pallas kernel on
    the saved QKV.  All weight grads are single large MXU matmuls."""
    (ln1s, ln1b, wqkv, bqkv, wproj, bproj,
     ln2s, ln2b, w1, b1, w2, b2) = params
    BW, N, C = x.shape
    dt = x.dtype

    # All big matmuls below run with DT (bf16 on the fast path) operands
    # and f32 accumulation (preferred_element_type): the v5e MXU is
    # bf16-native and f32 matmuls are emulated multi-pass, so feeding f32
    # cotangents into a generic jax.vjp silently turns every weight/
    # input-grad matmul into a multi-pass f32 one.  Elementwise chains
    # (LN statistics, GELU derivative, reductions) stay f32.
    def mm(a, b):
        return jnp.matmul(a, b, preferred_element_type=jnp.float32)

    def ln_f(r, s, bb):
        return _ln(r, s, bb)

    xf = x.reshape(-1, C).astype(jnp.float32)
    gf = g.reshape(-1, C).astype(jnp.float32)
    gd = g.reshape(-1, C).astype(dt)
    x2d = x.reshape(-1, C)                          # dt
    g2d = g.reshape(-1, C)
    ctx2 = ctx.reshape(-1, C)                       # dt
    dp1 = dp[0] if dp is not None else None        # (BW*N, 1) f32
    dp2 = dp[1] if dp is not None else None

    fused_ok = (dt == jnp.bfloat16 and (BW * N) % 8 == 0
                and not env_flag("MVLT_NO_FUSED_BWD"))
    # MLP-half kernel: dw1/dw2 (C, 4C) f32 accumulators must BOTH sit in
    # VMEM -> C <= 448.  qkv-tail kernel: one (C, 3C) f32 accumulator ->
    # fits through C = 768 (wide-stage training path).
    use_fused_bwd = fused_ok and C <= 448
    use_fused_tail = fused_ok and C <= 768

    if use_fused_bwd:
        # fused MLP-half backward kernel (res1 recompute + LN2/fc/GELU
        # vjp + ddp in VMEM); stage 4 (C=768) exceeds the weight-grad
        # accumulator VMEM budget and keeps the XLA formulation below
        dres1, dw1, db1, dw2, db2, dln2s, dln2b, ddp1, ddp2 = \
            swin_mlp_half_bwd(x2d, ctx2, g2d, wproj, bproj, ln2s, ln2b,
                              w1, b1, w2, b2, dp, interpret=interp)
        da = dres1 * dp1 if dp1 is not None else dres1
        da_d = da.astype(dt)
    else:
        # recompute res1 exactly from the saved ctx (one C^2 matmul)
        attn_nodp = mm(ctx2, wproj) + bproj
        res1 = xf + (attn_nodp * dp1 if dp1 is not None else attn_nodp)

        # --- MLP half: recompute LN2 + fc1 + GELU (needed for the GELU
        # derivative); fc2's product is recomputed only when the dp2 grad
        # needs it.  The forward kernel's bf16 fast path uses tanh-GELU
        # (_gelu_exact with fast=True); the recompute must match both for
        # gradient consistency and because exact-erf GELU is an expensive
        # VPU op at (M, 4C) f32 scale.
        approx_gelu = dt == jnp.bfloat16 and not interp

        h2f, vjp_ln2 = jax.vjp(ln_f, res1, ln2s, ln2b)
        h2d = h2f.astype(dt)
        a1 = mm(h2d, w1) + b1                          # f32 pre-GELU
        m, vjp_gelu = jax.vjp(
            lambda a: jax.nn.gelu(a, approximate=approx_gelu), a1)
        md = m.astype(dt)

        if dp2 is None:
            dmlp_f, ddp2 = gf, None
        else:
            mlp_nodp = mm(md, w2) + b2
            ddp2 = (gf * mlp_nodp).sum(-1, keepdims=True)
            dmlp_f = gf * dp2
        dmlp_d = dmlp_f.astype(dt)
        dw2 = mm(md.T, dmlp_d)
        db2 = dmlp_f.sum(0)
        dm = mm(dmlp_d, w2.astype(dt).T)
        (da1,) = vjp_gelu(dm)
        da1_d = da1.astype(dt)
        dw1 = mm(h2d.T, da1_d)
        db1 = da1.sum(0)
        dh2 = mm(da1_d, w1.astype(dt).T)
        dres1_ln, dln2s, dln2b = vjp_ln2(dh2)
        dres1 = gf + dres1_ln

        # --- attention tail (no recompute at all) ---
        da = dres1 * dp1 if dp1 is not None else dres1
        ddp1 = (dres1 * attn_nodp).sum(-1, keepdims=True) \
            if dp1 is not None else None
        da_d = da.astype(dt)
    dwproj = mm(ctx2.T, da_d)
    dbproj = da.sum(0)
    dctx = mm(da_d, wproj.astype(dt).T).astype(dt)

    # --- attention core backward on the saved QKV (Pallas, flat rows;
    # stored-p variant when the forward saved the softmax) ---
    dQKV2, dbias = attention_core_bwd_flat(qkv, dctx, bias, N, scale,
                                           num_heads, interpret=interp,
                                           p2=p)
    dQKV2_d = dQKV2.astype(dt)

    # --- qkv head: recompute LN1 (elementwise) ---
    if use_fused_tail:
        # fused tail kernel: LN1 recompute/vjp + qkv weight/input grads
        # stay in VMEM
        dx2, dwqkv, dbqkv, dln1s, dln1b = swin_qkv_tail_bwd(
            x2d, dQKV2, dres1, wqkv, ln1s, ln1b, interpret=interp)
        dx = dx2.reshape(BW, N, C)
    else:
        h1f, vjp_ln1 = jax.vjp(ln_f, xf, ln1s, ln1b)
        h1d = h1f.astype(dt)
        dwqkv = mm(h1d.T, dQKV2_d)
        dbqkv = dQKV2.astype(jnp.float32).sum(0)
        dh1 = mm(dQKV2_d, wqkv.astype(dt).T)
        dx_h, dln1s, dln1b = vjp_ln1(dh1)

        dx = (dres1 + dx_h).reshape(BW, N, C).astype(dt)
    dparams = (dln1s.astype(ln1s.dtype), dln1b.astype(ln1b.dtype),
               dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
               dwproj.astype(wproj.dtype), dbproj.astype(bproj.dtype),
               dln2s.astype(ln2s.dtype), dln2b.astype(ln2b.dtype),
               dw1.astype(w1.dtype), db1.astype(b1.dtype),
               dw2.astype(w2.dtype), db2.astype(b2.dtype))
    ddp = None if dp is None else (ddp1.astype(dp[0].dtype),
                                   ddp2.astype(dp[1].dtype))
    return dx, dparams, dbias.astype(jnp.float32), ddp


def _full_bwd_stored_shift(scale, num_heads, interpret, shift_spec, res,
                           g):
    """Store-residual backward for the shift-folded whole-block kernel.

    The saved QKV/ctx are in the SHIFTED window-major layout; x/g/dp are
    permuted into it (two XLA gathers — the same cost the fastcore
    recompute already paid), the layout-free stored backward runs there,
    and dx/ddp come back through the inverse permutation.  The (rel,
    mask) bias tuple grads are reductions of the combined-bias grad.
    When the forward stored p (opt-in, >=12 heads) it is ALREADY in the
    shifted merged-pair layout and feeds the stored-p core backward
    directly — per-window quantities never cross the permutation."""
    x, params, bias, dp, qkv, ctx, p = res
    interp = interpret or jax.default_backend() != "tpu"
    H, W, window, shift = shift_spec
    BW, N, C = x.shape
    nW = (H // window) * (W // window)
    rel, mask = bias
    combined = rel + mask[:, None]

    perm = jnp.asarray(_shift_perm(H, W, window, shift))
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))

    def to_shifted(a):
        ai = a.reshape(-1, nW * N, a.shape[-1])
        return jnp.take(ai, perm, axis=1).reshape(BW, N, a.shape[-1])

    def to_unshifted(a):
        ai = a.reshape(-1, nW * N, a.shape[-1])
        return jnp.take(ai, inv, axis=1).reshape(BW, N, a.shape[-1])

    x_s = to_shifted(x)
    g_s = to_shifted(g)
    dp_s = None
    if dp is not None:
        dp_s = tuple(to_shifted(d.reshape(BW, N, 1)).reshape(BW * N, 1)
                     for d in dp)

    dx_s, dparams, dbias, ddp_s = _stored_block_bwd(
        x_s, params, combined, dp_s, qkv, ctx, g_s, scale, num_heads,
        interp, p=p)

    dx = to_unshifted(dx_s).astype(x.dtype)
    ddp = None
    if ddp_s is not None:
        ddp = tuple(to_unshifted(d.reshape(BW, N, 1)).reshape(BW * N, 1)
                    .astype(dp[0].dtype) for d in ddp_s)
    drel = dbias.sum(axis=0, keepdims=True) if rel.shape[0] == 1 else dbias
    dmask = dbias.sum(axis=1)
    return dx, dparams, (drel.astype(jnp.float32),
                         dmask.astype(jnp.float32)), ddp


def _full_bwd(scale, num_heads, group, interpret, shift_spec, res, g):
    x, params, bias, dp, qkv, ctx, _p = res
    if qkv is not None:
        if shift_spec is not None:
            return _full_bwd_stored_shift(scale, num_heads, interpret,
                                          shift_spec, res, g)
        return _full_bwd_stored(scale, num_heads, interpret, res, g)

    def ref(x, params, bias, dp):
        return _full_ref_fastcore(x, params, bias, dp, scale, num_heads,
                                  interpret or jax.default_backend() != "tpu",
                                  shift_spec)

    _, vjp = jax.vjp(ref, x, params, bias, dp)
    return vjp(g)


swin_full_block.defvjp(_full_fwd, _full_bwd)


def _block_fwd(x, wqkv, bqkv, wproj, bproj, bias, scale, num_heads, group,
               interpret):
    out = _block_forward(x, wqkv, bqkv, wproj, bproj, bias, scale=scale,
                         num_heads=num_heads, group=group,
                         interpret=interpret)
    return out, (x, wqkv, bqkv, wproj, bproj, bias)


def _block_bwd(scale, num_heads, group, interpret, res, g):
    """Manual VJP: projections and weight grads are big XLA matmuls; the
    attention-core forward recompute and backward (the part XLA handles
    badly at window shapes) run as Pallas kernels."""
    x, wqkv, bqkv, wproj, bproj, bias = res
    BW, N, C = x.shape
    interp = interpret or jax.default_backend() != "tpu"

    x2 = x.reshape(-1, C)
    QKV = (x2 @ wqkv + bqkv).reshape(BW, N, 3 * C)
    ctx = attention_core(QKV, bias, scale, num_heads, interpret=interp)

    g2 = g.reshape(-1, C).astype(jnp.float32)
    ctx2 = ctx.reshape(-1, C).astype(jnp.float32)
    dwproj = ctx2.T @ g2
    dbproj = g2.sum(0)
    dctx = (g2 @ wproj.astype(jnp.float32).T).reshape(BW, N, C)

    dQKV, dbias = attention_core_bwd(QKV, dctx.astype(QKV.dtype), bias,
                                     scale, num_heads, interpret=interp)
    dQKV2 = dQKV.reshape(-1, 3 * C).astype(jnp.float32)
    dwqkv = x2.astype(jnp.float32).T @ dQKV2
    dbqkv = dQKV2.sum(0)
    dx = (dQKV2 @ wqkv.astype(jnp.float32).T).reshape(BW, N, C)
    return (dx.astype(x.dtype), dwqkv.astype(wqkv.dtype),
            dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
            dbproj.astype(bproj.dtype), dbias.astype(bias.dtype))


window_block_attention.defvjp(_block_fwd, _block_bwd)


# ---------------------------------------------------------------------------
# fusion-encoder (BERT) sub-block kernels: post-LN attention and MLP halves.
# A whole BERT-base block's weights (12*H^2 bf16 = 14.2MB) exceed VMEM, so
# the block splits at its natural residual boundaries:
#   attn half: LNout((qkv -> attention(+key bias) -> proj) + x)
#   mlp half:  LNout((fc2(gelu(fc1(x)))) + x)
# (reference modules/model.py:28 BertEncoder semantics; HF post-LN layout)
# ---------------------------------------------------------------------------

def _adrop_mask(seed_ref, sample: int, head: int, n: int, rate: float):
    """Regenerable in-kernel attention-dropout mask: values 0 or 1/keep,
    seeded by (step seed halves, ABSOLUTE sample index, head) so the
    backward kernel reproduces the forward's draw bit-exactly regardless
    of how either kernel groups samples per program.

    ``seed_ref`` is a (2,) f32 SMEM ref holding two 16-bit seed halves:
    Mosaic rejects scalar f32->i32 BITCASTS (`tpu.bitcast (f32) -> i32`),
    but plain converts of 16-bit-exact floats are lossless and supported."""
    from jax.experimental.pallas import tpu as _pltpu
    hi = seed_ref[0].astype(jnp.int32)
    lo = seed_ref[1].astype(jnp.int32)
    # Mosaic's prng_set_seed_32 accepts at most TWO values: fold the
    # step seed into one word and (sample, head) into the other
    # (head < 256 always; sample is an in-batch index, far below 2^23).
    _pltpu.prng_seed(hi * 65536 + lo, sample * 256 + head)
    bits = _pltpu.bitcast(_pltpu.prng_random_bits((n, n)), jnp.uint32)
    keep = 1.0 - rate
    thresh = jnp.uint32(min(int(keep * 2 ** 32), 2 ** 32 - 1))
    return jnp.where(bits < thresh, jnp.float32(1.0 / keep),
                     jnp.float32(0.0))


def _attn_ln_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                    kbias_ref, *rest, scale: float, num_heads: int,
                    seq_n: int, eps: float, fast: bool = False,
                    has_qbias: bool = False, has_amask: bool = False,
                    has_hmask: bool = False, save_res: bool = False,
                    adrop_rate: float = 0.0, save_amask: bool = False):
    """Post-LN attention half.  Optional refs (in order, when the flags
    are set): ``qbias`` (G, N, N) per-sample additive attention bias
    (seq2seq/UniLM masks), ``amask`` (G, nH, N, N) multiplicative
    attention-probability dropout mask (0 or 1/keep), ``hmask`` (G*N, C)
    multiplicative hidden-dropout mask applied to the projected output
    before the residual — HF Bert dropout placement; ``adrop_seed``
    (2,) f32 16-bit seed halves when ``adrop_rate > 0`` (in-kernel dropout
    mask generation — mutually exclusive with ``amask``).

    ``save_res``: QKV and ctx become outputs (residuals for the
    store-residual backward; ctx_ref doubles as the output).
    ``save_amask``: the generated dropout mask becomes a trailing debug
    output (on-chip parity tests)."""
    rest = list(rest)
    qbias_ref = rest.pop(0) if has_qbias else None
    amask_ref = rest.pop(0) if has_amask else None
    hmask_ref = rest.pop(0) if has_hmask else None
    adrop_ref = rest.pop(0) if adrop_rate > 0.0 else None
    amask_out_ref = rest.pop() if save_amask else None
    if save_res:
        lns_ref, lnb_ref, o_ref, qkv_ref, ctx_ref = rest
    else:
        qkv_ref = None
        lns_ref, lnb_ref, o_ref, ctx_ref = rest

    GN, C = x_ref.shape
    N = seq_n
    G = GN // N
    Dh = C // num_heads
    base = pl.program_id(0) * G          # kbias is the full (B, N) array

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    QKV = dot(x_ref[:], wqkv_ref[:])
    QKV = (QKV + bqkv_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    if qkv_ref is not None:
        qkv_ref[:] = QKV

    for g in range(G):
        rows = QKV[g * N:(g + 1) * N]
        kbias = kbias_ref[base + g][None, :]                 # (1, N) additive
        qb = qbias_ref[g].astype(jnp.float32) if has_qbias else None
        for hh in range(num_heads):
            q = rows[:, hh * Dh:(hh + 1) * Dh]
            k = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            v = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            if has_qbias or has_amask or adrop_rate > 0.0:
                if fast:
                    s = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                else:
                    s = jax.lax.dot_general(
                        q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                s = s + kbias
                if has_qbias:
                    s = s + qb
                p = _softmax_rows(s, fast)
                if has_amask:
                    p = p * amask_ref[g, hh].astype(jnp.float32)
                if adrop_rate > 0.0:
                    m = _adrop_mask(adrop_ref, base + g, hh, N, adrop_rate)
                    p = p * m
                    if save_amask:
                        amask_out_ref[g, hh] = m
                ctx = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                ctx = _attend(q, k, v, kbias, fast, scale)
            ctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh] = \
                ctx.astype(ctx_ref.dtype)

    attn = dot(ctx_ref[:], wproj_ref[:])
    attn = attn + bproj_ref[:].astype(jnp.float32)
    if has_hmask:
        attn = attn * hmask_ref[:].astype(jnp.float32)
    res = attn + x_ref[:].astype(jnp.float32)
    o_ref[:] = _ln(res, lns_ref[:], lnb_ref[:], eps=eps,
                   fast=fast).astype(o_ref.dtype)


def _attn_ln_xla_ref(x, wqkv, bqkv, wproj, bproj, kbias, lns, lnb, scale,
                     num_heads, eps, qbias=None, amask=None, hmask=None):
    B, N, C = x.shape
    Dh = C // num_heads
    qkv = (x.reshape(-1, C) @ wqkv + bqkv).reshape(B, N, 3, num_heads, Dh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    s = s + kbias[:, None, None, :]
    if qbias is not None:
        s = s + qbias[:, None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    if amask is not None:
        p = p * amask.astype(jnp.float32)
    ctx = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(-1, C)
    attn = (ctx @ wproj).astype(jnp.float32) + bproj
    attn = attn.reshape(B, N, C)
    if hmask is not None:
        attn = attn * hmask.astype(jnp.float32)
    res = attn + x.astype(jnp.float32)
    return _ln(res, lns, lnb, eps=eps).astype(x.dtype)


def _attn_ln_impl(x, wqkv, bqkv, wproj, bproj, kbias, qbias, amask, hmask,
                  lns, lnb, scale, num_heads, eps, group, interpret,
                  save_res=False, adrop=None, save_amask=False):
    """Shared forward: qbias/amask/hmask may be None (specs and kernel
    flags are built accordingly).  ``save_res=True`` additionally returns
    the in-kernel QKV (B, N_pad, 3C) and ctx (B, N_pad, C) residuals
    (padded layout — the backward works on padded arrays).

    ``adrop``: (seed (2,) f32 16-bit-halves array, rate) for IN-KERNEL
    attention-dropout mask generation (pltpu PRNG; NOT interpretable on
    CPU — on-chip tests only).  Mutually exclusive with ``amask``.
    ``save_amask`` appends the generated (B, nH, N_pad, N_pad) f32 mask
    as a trailing debug output."""
    B, N, C = x.shape
    N_pad = -(-N // 8) * 8
    if N_pad != N:
        x = jnp.pad(x, ((0, 0), (0, N_pad - N), (0, 0)))
        kbias = jnp.pad(kbias, ((0, 0), (0, N_pad - N)),
                        constant_values=-1e9)
        if qbias is not None:
            qbias = jnp.pad(qbias, ((0, 0), (0, N_pad - N),
                                    (0, N_pad - N)))
        if amask is not None:
            amask = jnp.pad(amask, ((0, 0), (0, 0), (0, N_pad - N),
                                    (0, N_pad - N)))
        if hmask is not None:
            hmask = jnp.pad(hmask, ((0, 0), (0, N_pad - N), (0, 0)))

    G = group
    # working set ~20 B per (row, chan): x/out bf16 double-buffered, QKV
    # f32 transient, ctx scratch; the attention dropout mask block adds
    # nH * N bf16 per row when present
    per_row = 20 * C + (2 * num_heads * N_pad if amask is not None else 0) \
        + (4 * N_pad if qbias is not None else 0) \
        + (2 * C if hmask is not None else 0)
    while G > 1 and (B % G != 0
                     or G * N_pad * per_row > 8 * 1024 * 1024):
        G //= 2

    x2 = x.reshape(B * N_pad, C)
    grid = (B // G,)
    x_spec = pl.BlockSpec((G * N_pad, C), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    kb_spec = pl.BlockSpec((B, N_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [x_spec, const_spec(wqkv.shape), const_spec(bqkv.shape),
                const_spec(wproj.shape), const_spec(bproj.shape), kb_spec]
    operands = [x2, wqkv, bqkv, wproj, bproj, kbias]
    if qbias is not None:
        in_specs.append(pl.BlockSpec((G, N_pad, N_pad),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(qbias)
    if amask is not None:
        in_specs.append(pl.BlockSpec((G, num_heads, N_pad, N_pad),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(amask)
    if hmask is not None:
        in_specs.append(x_spec)
        operands.append(hmask.reshape(B * N_pad, C))
    if adrop is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(adrop[0])
    in_specs += [const_spec(lns.shape), const_spec(lnb.shape)]
    operands += [lns, lnb]

    out_specs = x_spec
    out_shape = jax.ShapeDtypeStruct(x2.shape, x.dtype)
    scratch = [pltpu.VMEM((G * N_pad, C), x.dtype)]
    if save_res:
        qkv_spec = pl.BlockSpec((G * N_pad, 3 * C), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_specs = (x_spec, qkv_spec, x_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B * N_pad, 3 * C), x.dtype),
                     jax.ShapeDtypeStruct(x2.shape, x.dtype))
        scratch = []
    if save_amask:
        assert save_res and adrop is not None
        am_spec = pl.BlockSpec((G, num_heads, N_pad, N_pad),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        out_specs = out_specs + (am_spec,)
        out_shape = out_shape + (jax.ShapeDtypeStruct(
            (B, num_heads, N_pad, N_pad), jnp.float32),)
    out = pl.pallas_call(
        functools.partial(
            _attn_ln_kernel, scale=scale, num_heads=num_heads, seq_n=N_pad,
            eps=eps, fast=(x.dtype == jnp.bfloat16 and not interpret),
            has_qbias=qbias is not None, has_amask=amask is not None,
            has_hmask=hmask is not None, save_res=save_res,
            adrop_rate=(adrop[1] if adrop is not None else 0.0),
            save_amask=save_amask),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    if save_amask:
        *out, amask_dbg = out
    if save_res:
        out, qkv, ctx = out
        res3 = (out.reshape(B, N_pad, C)[:, :N],
                qkv.reshape(B, N_pad, 3 * C), ctx.reshape(B, N_pad, C))
        return res3 + ((amask_dbg,) if save_amask else ())
    return out.reshape(B, N_pad, C)[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def fused_attn_ln(x, wqkv, bqkv, wproj, bproj, kbias, lns, lnb,
                  scale: float, num_heads: int, eps: float = 1e-12,
                  group: int = 8, interpret: bool = False):
    """Post-LN BERT attention half: ``LN(attn(x) + x)``.

    x: (B, N, C); kbias: (B, N) additive key bias (0 / -10000 from
    masks.mask_to_bias).  Pads N to a multiple of 8 internally (padded
    keys masked, padded rows sliced off — LN over the padded garbage rows
    is harmless)."""
    return _attn_ln_impl(x, wqkv, bqkv, wproj, bproj, kbias, None, None,
                         None, lns, lnb, scale, num_heads, eps, group,
                         interpret)


def _attn_ln_fwd(x, wqkv, bqkv, wproj, bproj, kbias, lns, lnb, scale,
                 num_heads, eps, group, interpret):
    out, qkv, ctx = _attn_ln_impl(x, wqkv, bqkv, wproj, bproj, kbias,
                                  None, None, None, lns, lnb, scale,
                                  num_heads, eps, group, interpret,
                                  save_res=True)
    return out, (x, wqkv, bqkv, wproj, bproj, kbias, None, None, None,
                 lns, lnb, qkv, ctx)


def _seq_core_bwd_kernel(qkv_ref, dctx_ref, kbias_ref, *rest,
                         scale: float, num_heads: int, seq_n: int,
                         fast: bool = False, has_qbias: bool = False,
                         has_amask: bool = False,
                         adrop_rate: float = 0.0):
    """Backward of the per-sample attention core at sequence geometry.

    The XLA formulation of this vjp materializes five (B, nH, N, N)
    tensors (s, p, dpa, ds and casts) through HBM — ~100 MB each at
    flagship pretrain shapes — which made the attention-half backward
    ~5x its forward.  This kernel keeps every score-sized intermediate
    in VMEM: one read of the saved QKV/dctx blocks, one write of dQKV.

    Block layout mirrors :func:`_attn_ln_kernel`: rows are
    ``(G * N_pad, .)`` with G samples per program; ``kbias`` is the full
    (B, N_pad) array indexed with the grid offset; qbias/amask are
    per-program blocks.  Fast path recomputes the overflow-clamp softmax
    exactly as the forward kernel so the gradient is consistent with the
    function actually evaluated; dots run with dtype-native (bf16)
    operands + f32 accumulation."""
    rest = list(rest)
    qbias_ref = rest.pop(0) if has_qbias else None
    amask_ref = rest.pop(0) if has_amask else None
    adrop_ref = rest.pop(0) if adrop_rate > 0.0 else None
    dqkv_ref, dkb_ref = rest

    GN, C3 = qkv_ref.shape
    C = C3 // 3
    N = seq_n
    G = GN // N
    Dh = C // num_heads
    base = pl.program_id(0) * G
    ones = jnp.ones((N, 1), jnp.float32)
    dt = qkv_ref.dtype

    for g in range(G):
        rows = qkv_ref[g * N:(g + 1) * N]
        kbias = kbias_ref[base + g][None, :]
        qb = qbias_ref[g].astype(jnp.float32) if has_qbias else None
        dkb_acc = jnp.zeros((1, N), jnp.float32)
        for hh in range(num_heads):
            qd = rows[:, hh * Dh:(hh + 1) * Dh]
            kd = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            vd = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            dctx_d = dctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh]
            if fast:
                s = jax.lax.dot_general(qd, kd, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s * scale + kbias
            else:
                qd = qd.astype(jnp.float32) * scale
                kd = kd.astype(jnp.float32)
                vd = vd.astype(jnp.float32)
                dctx_d = dctx_d.astype(jnp.float32)
                s = jax.lax.dot_general(qd, kd, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s + kbias
            if qb is not None:
                s = s + qb
            if fast:
                e = jnp.exp(jnp.minimum(s, 60.0))
            else:
                e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            denom = jax.lax.dot_general(e, ones, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            if fast:
                p = e * pl.reciprocal(jnp.maximum(denom, 1e-30), approx=True)
            else:
                p = e / denom
            if has_amask:
                am = amask_ref[g, hh].astype(jnp.float32)
                pa = p * am
            elif adrop_rate > 0.0:
                # regenerate the forward's dropout draw bit-exactly
                am = _adrop_mask(adrop_ref, base + g, hh, N, adrop_rate)
                pa = p * am
            else:
                am, pa = None, p
            pa_d = pa.astype(dt) if fast else pa
            # dpa = dctx V^T (lane-lane); dv = Pa^T dctx (row-row)
            dpa = jax.lax.dot_general(dctx_d, vd, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dv = jax.lax.dot_general(pa_d, dctx_d, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = dpa * am if am is not None else dpa
            pdp = p * dp
            rd = jax.lax.dot_general(pdp, ones, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = pdp - p * rd
            # dkbias: column sum of ds, accumulated over heads (MXU matvec)
            dkb_acc = dkb_acc + jax.lax.dot_general(
                ones, ds, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dsd = ds.astype(dt) if fast else ds
            if fast:
                dq = jax.lax.dot_general(
                    dsd, kd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dk = jax.lax.dot_general(
                    dsd, qd, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            else:
                # slow path: qd already carries scale (dk inherits it;
                # dq scales explicitly) — mirrors _core_bwd_kernel
                dq = jax.lax.dot_general(
                    dsd, kd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dk = jax.lax.dot_general(
                    dsd, qd, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            r0 = g * N
            dqkv_ref[r0:r0 + N, hh * Dh:(hh + 1) * Dh] = \
                dq.astype(dqkv_ref.dtype)
            dqkv_ref[r0:r0 + N, C + hh * Dh:C + (hh + 1) * Dh] = \
                dk.astype(dqkv_ref.dtype)
            dqkv_ref[r0:r0 + N, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh] = \
                dv.astype(dqkv_ref.dtype)
        # dkb_ref is the full (B, N) array (constant index map — a
        # (G, N) block would violate the (8, 128) tiling rule); programs
        # write disjoint row ranges of the resident block.
        dkb_ref[pl.dslice(base + g, 1), :] = dkb_acc


def seq_attention_core_bwd(qkv, dctx, kbias, qbias, amask, scale: float,
                           num_heads: int, interpret: bool = False,
                           adrop=None):
    """VJP of the sequence attention core wrt (qkv, kbias).

    ``ctx = (softmax(q k^T * scale + kbias [+ qbias]) [* amask]) v`` per
    sample/head from fused-qkv rows.  qkv: (B, N, 3C) (padded layout from
    the fused forward), dctx: (B, N, C), kbias: (B, N) f32, qbias:
    (B, N, N) f32 or None, amask: (B, nH, N, N) or None.

    Returns ``(dqkv (B, N, 3C) in qkv.dtype, dkbias (B, N) f32)``.
    qbias/amask carry no gradient (seq2seq masks / dropout masks)."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    G = 8
    # VMEM: qkv + dqkv + dctx blocks (double-buffered) + per-head f32
    # score intermediates; amask adds nH*N bf16 per row, qbias 4N
    per_row = 16 * C + (2 * num_heads * N if amask is not None else 0) \
        + (4 * N if qbias is not None else 0)
    while G > 1 and (B % G != 0 or G * N * per_row > 8 * 1024 * 1024):
        G //= 2
    while B % G != 0:
        G //= 2

    grid = (B // G,)
    row_spec = lambda c: pl.BlockSpec((G * N, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    kb_spec = pl.BlockSpec((B, N), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [row_spec(C3), row_spec(C), kb_spec]
    operands = [qkv.reshape(B * N, C3), dctx.reshape(B * N, C),
                kbias.astype(jnp.float32)]
    if qbias is not None:
        in_specs.append(pl.BlockSpec((G, N, N), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(qbias)
    if amask is not None:
        in_specs.append(pl.BlockSpec((G, num_heads, N, N),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(amask)
    if adrop is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(adrop[0])
    dqkv, dkb = pl.pallas_call(
        functools.partial(
            _seq_core_bwd_kernel, scale=scale, num_heads=num_heads,
            seq_n=N, fast=(qkv.dtype == jnp.bfloat16 and not interpret),
            has_qbias=qbias is not None, has_amask=amask is not None,
            adrop_rate=(adrop[1] if adrop is not None else 0.0)),
        grid=grid,
        in_specs=in_specs,
        out_specs=(row_spec(C3),
                   pl.BlockSpec((B, N), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B * N, C3), qkv.dtype),
                   jax.ShapeDtypeStruct((B, N), jnp.float32)),
        interpret=interpret,
    )(*operands)
    return dqkv.reshape(B, N, C3), dkb


def _attn_ln_bwd_stored(scale, num_heads, eps, res, g, interpret=False):
    """Store-residual backward of the post-LN attention half.

    The saved in-kernel QKV and ctx replace the qkv-projection and
    attention-context recompute; the attention score/softmax recompute
    (needed for the softmax vjp) runs from the saved QKV — through
    :func:`seq_attention_core_bwd` (score tensors stay in VMEM) on the
    bf16 path, as standard BERT-shaped XLA einsums otherwise.  All other
    recompute is elementwise."""
    adrop = None
    if len(res) == 14:                  # fused_attn_ln_adrop residuals
        (x, wqkv, bqkv, wproj, bproj, kbias, qbias, amask, hmask, lns,
         lnb, qkv, ctx, adrop) = res
    else:
        (x, wqkv, bqkv, wproj, bproj, kbias, qbias, amask, hmask, lns,
         lnb, qkv, ctx) = res
    B, N, C = x.shape
    dt = x.dtype
    Dh = C // num_heads
    N_pad = qkv.shape[1]
    if N_pad != N:
        x = jnp.pad(x, ((0, 0), (0, N_pad - N), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, N_pad - N), (0, 0)))
        kbias = jnp.pad(kbias, ((0, 0), (0, N_pad - N)),
                        constant_values=-1e9)
        if qbias is not None:
            qbias = jnp.pad(qbias, ((0, 0), (0, N_pad - N),
                                    (0, N_pad - N)))
        if amask is not None:
            amask = jnp.pad(amask, ((0, 0), (0, 0), (0, N_pad - N),
                                    (0, N_pad - N)))
        if hmask is not None:
            hmask = jnp.pad(hmask, ((0, 0), (0, N_pad - N), (0, 0)))

    x2 = x.reshape(-1, C)
    g2 = g.reshape(-1, C)
    ctx2 = ctx.reshape(-1, C)
    hmask2 = hmask.reshape(-1, C).astype(jnp.float32) \
        if hmask is not None else None

    # recompute the pre-LN sum exactly from the saved ctx
    attn = jnp.matmul(ctx2, wproj,
                      preferred_element_type=jnp.float32) + bproj
    if hmask2 is not None:
        attn = attn * hmask2
    res_sum = attn + x2.astype(jnp.float32)

    def ln_piece(res_f, lns, lnb):
        return _ln(res_f, lns, lnb, eps=eps).astype(dt)

    _, vjp_ln = jax.vjp(ln_piece, res_sum, lns, lnb)
    dres, dlns, dlnb = vjp_ln(g2)

    da = dres * hmask2 if hmask2 is not None else dres

    if dt == jnp.bfloat16:
        # hand-written mixed-precision backward: all matmuls/einsums run
        # with bf16 operands + f32 accumulation (the v5e MXU is
        # bf16-native; f32 matmuls are emulated multi-pass).  Softmax
        # statistics, the jacobian and reductions stay f32.
        def mm(a, b):
            return jnp.matmul(a, b, preferred_element_type=jnp.float32)

        da_d = da.astype(dt)
        dwproj = mm(ctx2.T, da_d)
        dbproj = da.sum(0)
        dctx = mm(da_d, wproj.astype(dt).T).astype(dt)

        dQKV, dkbias = seq_attention_core_bwd(
            qkv, dctx.reshape(B, N_pad, C), kbias, qbias, amask, scale,
            num_heads, interpret=interpret, adrop=adrop)
        dQKV2_d = dQKV.reshape(-1, 3 * C)
        dwqkv = mm(x2.astype(dt).T, dQKV2_d)
        dbqkv = dQKV2_d.astype(jnp.float32).sum(0)
        dx2 = mm(dQKV2_d, wqkv.astype(dt).T)
    else:
        assert adrop is None, "in-kernel attention dropout is bf16-only"
        dwproj = ctx2.astype(jnp.float32).T @ da
        dbproj = da.sum(0)
        dctx = (da @ wproj.astype(jnp.float32).T).astype(dt)

        # attention core vjp from the saved QKV (standard BERT shapes —
        # XLA handles these well; the ctx product is dead code)
        def core_piece(qkv3, kbias_p):
            q, k, v = (qkv3[..., i * C:(i + 1) * C]
                       .reshape(B, N_pad, num_heads, Dh)
                       .transpose(0, 2, 1, 3)
                       for i in range(3))
            s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale,
                           k.astype(jnp.float32))
            s = s + kbias_p[:, None, None, :]
            if qbias is not None:
                s = s + qbias[:, None].astype(jnp.float32)
            p = jax.nn.softmax(s, axis=-1)
            if amask is not None:
                p = p * amask.astype(jnp.float32)
            c = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
            return c.transpose(0, 2, 1, 3).reshape(-1, C)

        _, vjp_core = jax.vjp(core_piece, qkv, kbias)
        dQKV, dkbias = vjp_core(dctx)
        dQKV2 = dQKV.reshape(-1, 3 * C).astype(jnp.float32)

        dwqkv = x2.astype(jnp.float32).T @ dQKV2
        dbqkv = dQKV2.sum(0)
        dx2 = dQKV2 @ wqkv.astype(jnp.float32).T

    dx = (dres + dx2).reshape(B, N_pad, C)[:, :N].astype(dt)
    dkbias = dkbias[:, :N].astype(kbias.dtype)
    return (dx, dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwproj.astype(wproj.dtype), dbproj.astype(bproj.dtype),
            dkbias, dlns.astype(lns.dtype), dlnb.astype(lnb.dtype))


def _attn_ln_bwd(scale, num_heads, eps, group, interpret, res, g):
    return _attn_ln_bwd_stored(scale, num_heads, eps, res, g,
                               interpret=interpret)


fused_attn_ln.defvjp(_attn_ln_fwd, _attn_ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def fused_attn_ln_masked(x, wqkv, bqkv, wproj, bproj, kbias, qbias, amask,
                         hmask, lns, lnb, scale: float, num_heads: int,
                         eps: float = 1e-12, group: int = 8,
                         interpret: bool = False):
    """Training / seq2seq variant of :func:`fused_attn_ln`:

    - ``qbias`` (B, N, N) per-sample additive attention bias (the UniLM
      seq2seq mask; head-independent) — enables the fused path for the
      reference's seq2seq branch, not just key-padding masks;
    - ``amask`` (B, nH, N, N) multiplicative attention-probability
      dropout mask (0 or 1/keep), applied after softmax (HF placement);
    - ``hmask`` (B, N, C) multiplicative hidden-dropout mask, applied to
      the projected output before the residual.

    Masks are inputs rather than in-kernel PRNG so the path is testable
    off-chip; their HBM reads are small next to the fused savings, and
    the XLA fallback materializes the same tensors anyway.  Use
    ``jnp.zeros``/``ones``-free ``None``-equivalents by calling
    :func:`fused_attn_ln` instead when nothing is masked."""
    return _attn_ln_impl(x, wqkv, bqkv, wproj, bproj, kbias, qbias, amask,
                         hmask, lns, lnb, scale, num_heads, eps, group,
                         interpret)


def _attn_ln_masked_fwd(x, wqkv, bqkv, wproj, bproj, kbias, qbias, amask,
                        hmask, lns, lnb, scale, num_heads, eps, group,
                        interpret):
    out, qkv, ctx = _attn_ln_impl(x, wqkv, bqkv, wproj, bproj, kbias,
                                  qbias, amask, hmask, lns, lnb, scale,
                                  num_heads, eps, group, interpret,
                                  save_res=True)
    return out, (x, wqkv, bqkv, wproj, bproj, kbias, qbias, amask, hmask,
                 lns, lnb, qkv, ctx)


def _attn_ln_masked_bwd(scale, num_heads, eps, group, interpret, res, g):
    qbias, amask, hmask = res[6:9]
    (dx, dwqkv, dbqkv, dwproj, dbproj, dkbias, dlns, dlnb) = \
        _attn_ln_bwd_stored(scale, num_heads, eps, res, g,
                            interpret=interpret)
    zero = lambda a: None if a is None else jnp.zeros_like(a)
    return (dx, dwqkv, dbqkv, dwproj, dbproj, dkbias, zero(qbias),
            zero(amask), zero(hmask), dlns, dlnb)


fused_attn_ln_masked.defvjp(_attn_ln_masked_fwd, _attn_ln_masked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15, 16))
def fused_attn_ln_adrop(x, wqkv, bqkv, wproj, bproj, kbias, qbias, hmask,
                        lns, lnb, adrop_seed, scale: float, num_heads: int,
                        adrop_rate: float, eps: float = 1e-12,
                        group: int = 8, interpret: bool = False):
    """:func:`fused_attn_ln_masked` with IN-KERNEL attention dropout:
    instead of reading a (B, nH, N, N) mask from HBM, the kernel draws it
    from the pltpu PRNG seeded by (``adrop_seed``, absolute sample, head)
    and the backward kernel regenerates the identical draw — no mask
    generation, no mask HBM traffic (~3x the mask bytes per step).

    ``adrop_seed``: (2,) float32 holding two 16-bit seed halves (float
    dtype keeps custom_vjp cotangent plumbing trivial; 16-bit halves
    because Mosaic rejects scalar f32->i32 bitcasts, so the kernel
    recovers them with a lossless convert — see :func:`_adrop_mask`).
    bf16-only training fast path; pltpu PRNG does not interpret
    on CPU, so tests are on-chip (tests/test_tpu_parity.py)."""
    return _attn_ln_impl(x, wqkv, bqkv, wproj, bproj, kbias, qbias, None,
                         hmask, lns, lnb, scale, num_heads, eps, group,
                         interpret, adrop=(adrop_seed, adrop_rate))


def _attn_ln_adrop_fwd(x, wqkv, bqkv, wproj, bproj, kbias, qbias, hmask,
                       lns, lnb, adrop_seed, scale, num_heads, adrop_rate,
                       eps, group, interpret):
    out, qkv, ctx = _attn_ln_impl(
        x, wqkv, bqkv, wproj, bproj, kbias, qbias, None, hmask, lns, lnb,
        scale, num_heads, eps, group, interpret, save_res=True,
        adrop=(adrop_seed, adrop_rate))
    return out, (x, wqkv, bqkv, wproj, bproj, kbias, qbias, None, hmask,
                 lns, lnb, qkv, ctx, (adrop_seed, adrop_rate))


def _attn_ln_adrop_bwd(scale, num_heads, adrop_rate, eps, group, interpret,
                       res, g):
    qbias, hmask = res[6], res[8]
    adrop_seed = res[13][0]
    (dx, dwqkv, dbqkv, dwproj, dbproj, dkbias, dlns, dlnb) = \
        _attn_ln_bwd_stored(scale, num_heads, eps, res, g,
                            interpret=interpret)
    zero = lambda a: None if a is None else jnp.zeros_like(a)
    return (dx, dwqkv, dbqkv, dwproj, dbproj, dkbias, zero(qbias),
            zero(hmask), dlns, dlnb, jnp.zeros_like(adrop_seed))


fused_attn_ln_adrop.defvjp(_attn_ln_adrop_fwd, _attn_ln_adrop_bwd)


def _mlp_ln_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest,
                   eps: float, fast: bool = False,
                   has_hmask: bool = False, save_res: bool = False):
    rest = list(rest)
    hmask_ref = rest.pop(0) if has_hmask else None
    if save_res:
        lns_ref, lnb_ref, o_ref, res_ref = rest
    else:
        lns_ref, lnb_ref, o_ref = rest

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    m = dot(x_ref[:], w1_ref[:])
    m = m + b1_ref[:].astype(jnp.float32)
    m = _gelu_exact(m, fast)
    out = dot(m.astype(x_ref.dtype), w2_ref[:])
    out = out + b2_ref[:].astype(jnp.float32)
    if has_hmask:
        out = out * hmask_ref[:].astype(jnp.float32)
    res = out + x_ref[:].astype(jnp.float32)
    if save_res:
        # pre-LN residual sum in f32: the store-residual backward takes
        # the exact LN statistics from it instead of recomputing the MLP
        res_ref[:] = res
    o_ref[:] = _ln(res, lns_ref[:], lnb_ref[:], eps=eps,
                   fast=fast).astype(o_ref.dtype)


def _mlp_ln_xla_ref(x, w1, b1, w2, b2, lns, lnb, eps, hmask=None):
    shape = x.shape
    C = shape[-1]
    x2 = x.reshape(-1, C)
    m = jax.nn.gelu((x2 @ w1).astype(jnp.float32) + b1, approximate=False)
    out = (m.astype(x.dtype) @ w2).astype(jnp.float32) + b2
    if hmask is not None:
        out = out * hmask.reshape(-1, C).astype(jnp.float32)
    res = out + x2.astype(jnp.float32)
    return _ln(res, lns, lnb, eps=eps).astype(x.dtype).reshape(shape)


def _mlp_ln_impl(x, w1, b1, w2, b2, hmask, lns, lnb, eps, rows, interpret,
                 save_res=False):
    shape = x.shape
    C = shape[-1]
    x2 = x.reshape(-1, C)
    M = x2.shape[0]
    R = rows
    if M % R != 0:
        # pad the row dim up to a whole chunk: big chunks keep the MXU
        # M-dimension full (a divisor search can degrade to tiny R)
        M_pad = -(-M // R) * R
        x2 = jnp.pad(x2, ((0, M_pad - M), (0, 0)))
        M = M_pad

    grid = (M // R,)
    x_spec = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def const_spec(shape_):
        return pl.BlockSpec(shape_, lambda i: (0,) * len(shape_),
                            memory_space=pltpu.VMEM)

    in_specs = [x_spec, const_spec(w1.shape), const_spec(b1.shape),
                const_spec(w2.shape), const_spec(b2.shape)]
    operands = [x2, w1, b1, w2, b2]
    if hmask is not None:
        h2 = hmask.reshape(-1, C)
        if h2.shape[0] != M:
            h2 = jnp.pad(h2, ((0, M - h2.shape[0]), (0, 0)))
        in_specs.append(x_spec)
        operands.append(h2)
    in_specs += [const_spec(lns.shape), const_spec(lnb.shape)]
    operands += [lns, lnb]

    out_specs = x_spec
    out_shape = jax.ShapeDtypeStruct(x2.shape, x.dtype)
    if save_res:
        out_specs = (x_spec, x_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct(x2.shape, jnp.float32))
    out = pl.pallas_call(
        functools.partial(_mlp_ln_kernel, eps=eps,
                          fast=(x.dtype == jnp.bfloat16 and not interpret),
                          has_hmask=hmask is not None, save_res=save_res),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    if save_res:
        out, res = out
        return out[:x.size // C].reshape(shape), res
    return out[:x.size // C].reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_mlp_ln(x, w1, b1, w2, b2, lns, lnb, eps: float = 1e-12,
                 rows: int = 256, interpret: bool = False):
    """Post-LN BERT MLP half: ``LN(fc2(gelu(fc1(x))) + x)``.

    Rows are independent (no attention), so the grid just chunks the
    flattened (B*S, C) row dim.  x: (..., C)."""
    return _mlp_ln_impl(x, w1, b1, w2, b2, None, lns, lnb, eps, rows,
                        interpret)


def _mlp_ln_fwd(x, w1, b1, w2, b2, lns, lnb, eps, rows, interpret):
    out, res_sum = _mlp_ln_impl(x, w1, b1, w2, b2, None, lns, lnb, eps,
                                rows, interpret, save_res=True)
    return out, (x, w1, b1, w2, b2, None, lns, lnb, res_sum)


def _mlp_ln_bwd_kernel(x_ref, res_ref, g_ref, w1_ref, b1_ref, w2_ref,
                       lns_ref, *rest, eps: float, fast: bool,
                       has_hmask: bool):
    """Backward of the post-LN BERT MLP half on a (row chunk, H chunk)
    grid cell, with weight-grad accumulation across the sequential grid.

    Grid is (J, I) = (H chunks, row chunks) with rows innermost, so each
    (C, Hc)/(Hc, C) weight-grad block stays VMEM-resident for a whole
    row sweep and is written to HBM once.  The (R, Hc) f32 intermediates
    (pre-GELU, GELU value/derivative, cotangents) that the XLA
    formulation round-trips through HBM live and die in VMEM.  dx is
    revisited across H chunks (J extra (R, C) f32 round trips — small
    next to the (M, 4C) intermediates saved).  LN backward runs from the
    saved pre-LN sum; per-H-chunk recompute of it is elementwise."""
    rest = list(rest)
    hmask_ref = rest.pop(0) if has_hmask else None
    (dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dlns_ref,
     dlnb_ref) = rest

    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init_w():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_c():
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

    R, C = x_ref.shape
    dt = x_ref.dtype
    rowsum, colsum = _mxu_sums(R, C)
    dot, dot_t, dot_rows = _dot, _dot_t, _dot_rows

    gf = g_ref[:].astype(jnp.float32)
    res = res_ref[:]

    # LN backward from the saved pre-LN sum (recomputed per H chunk —
    # elementwise + matvec moments, cheap next to the chunk matmuls)
    mu = rowsum(res) * (1.0 / C)
    var = rowsum(res * res) * (1.0 / C) - mu * mu
    r = jax.lax.rsqrt(var + eps)
    xhat = (res - mu) * r
    dxhat = gf * lns_ref[:].astype(jnp.float32)
    mdx = rowsum(dxhat) * (1.0 / C)
    mdxx = rowsum(dxhat * xhat) * (1.0 / C)
    dres = r * (dxhat - mdx - xhat * mdxx)

    dmlp = dres * hmask_ref[:].astype(jnp.float32) if has_hmask else dres
    dmlp_d = dmlp.astype(dt)

    @pl.when(j == 0)
    def _ln_grads():
        db2_ref[...] += colsum(dmlp)
        dlns_ref[...] += colsum(gf * xhat)
        dlnb_ref[...] += colsum(gf)

    # fc1 + GELU recompute on this H chunk
    a1 = dot(x_ref[:], w1_ref[:]) + b1_ref[:].astype(jnp.float32)
    m, dg = _gelu_grad(a1, fast)
    md = m.astype(dt)

    dw2_ref[...] += dot_rows(md, dmlp_d)
    dm = dot_t(dmlp_d, w2_ref[:])                   # (R, Hc) f32
    da1 = dm * dg
    da1_d = da1.astype(dt)
    dw1_ref[...] += dot_rows(x_ref[:], da1_d)
    db1_ref[...] += colsum(da1)
    dxg = dot_t(da1_d, w1_ref[:])                   # (R, C) f32

    # dx partials: each (j, i) cell writes its own block exactly once
    # (Pallas only guarantees output-block revisits across CONSECUTIVE
    # grid steps; dx blocks would be revisited non-consecutively across
    # H chunks). The caller sums the J partials; the dres term rides
    # the j == 0 partial.
    @pl.when(j == 0)
    def _dx_first():
        dx_ref[:] = dres + dxg

    @pl.when(j != 0)
    def _dx_rest():
        dx_ref[:] = dxg


def mlp_ln_half_bwd(x2, res2, g2, hmask2, w1, b1, w2, lns,
                    eps: float = 1e-12, interpret: bool = False,
                    h_chunk: int = 0):
    """Fused backward of the post-LN BERT MLP half (LN vjp from the saved
    pre-LN sum + fc1/GELU/fc2 vjp) over flattened rows, H-chunked so
    BERT-base (C=768, H=3072) weight-grad accumulators fit VMEM.

    x2/g2/hmask2: (M, C) compute dtype; res2: (M, C) f32 saved pre-LN
    sum.  Returns ``(dx (M, C) f32 — includes the residual dres term,
    dw1, db1, dw2, db2, dlns, dlnb)`` with weight grads f32."""
    M, C = x2.shape
    H = w1.shape[1]
    Hc = h_chunk or H
    while Hc > 128 and (H % Hc != 0 or C * Hc * 4 * 2 > 5 * 1024 * 1024):
        Hc //= 2
    R = 128
    M_pad = -(-M // R) * R
    if M_pad != M:
        # zero-padded g rows contribute exactly zero to every grad
        pad = ((0, M_pad - M), (0, 0))
        x2, g2, res2 = (jnp.pad(a, pad) for a in (x2, g2, res2))
        if hmask2 is not None:
            hmask2 = jnp.pad(hmask2, pad)

    J, I = H // Hc, M_pad // R
    grid = (J, I)
    row_spec = lambda c: pl.BlockSpec((R, c), lambda j, i: (i, 0),
                                      memory_space=pltpu.VMEM)
    # dx partials: one distinct (R, C) block per (j, i) grid cell
    dx_spec = pl.BlockSpec((R, C), lambda j, i: (j * I + i, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [row_spec(C), row_spec(C), row_spec(C),
                pl.BlockSpec((C, Hc), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hc), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Hc, C), lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda j, i: (0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [x2, res2, g2, w1, b1.reshape(1, -1), w2,
                lns.reshape(1, -1)]
    if hmask2 is not None:
        in_specs.append(row_spec(C))
        operands.append(hmask2)

    cvec = pl.BlockSpec((1, C), lambda j, i: (0, 0),
                        memory_space=pltpu.VMEM)
    out_specs = (dx_spec,
                 pl.BlockSpec((C, Hc), lambda j, i: (0, j),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, Hc), lambda j, i: (0, j),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((Hc, C), lambda j, i: (j, 0),
                              memory_space=pltpu.VMEM),
                 cvec, cvec, cvec)
    out_shape = (jax.ShapeDtypeStruct((J * M_pad, C), jnp.float32),
                 jax.ShapeDtypeStruct((C, H), jnp.float32),
                 jax.ShapeDtypeStruct((1, H), jnp.float32),
                 jax.ShapeDtypeStruct((H, C), jnp.float32),
                 jax.ShapeDtypeStruct((1, C), jnp.float32),
                 jax.ShapeDtypeStruct((1, C), jnp.float32),
                 jax.ShapeDtypeStruct((1, C), jnp.float32))
    dx, dw1, db1, dw2, db2, dlns, dlnb = pl.pallas_call(
        functools.partial(
            _mlp_ln_bwd_kernel, eps=eps,
            fast=(x2.dtype == jnp.bfloat16 and not interpret),
            has_hmask=hmask2 is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        # the kernel's scoped demand is ~16.2MB at (R=128, Hc=768, C=768)
        # — a hair over the 16MB default.  Whether it fits depends on
        # what ELSE the surrounding module keeps VMEM-resident across
        # the call (the (J*M, C) dx partials sometimes get the
        # output-in-vmem treatment), so the margin must be explicit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024),
    )(*operands)
    dx = dx.reshape(J, M_pad, C).sum(0) if J > 1 else dx
    return (dx[:M], dw1, db1.reshape(-1), dw2, db2.reshape(-1),
            dlns.reshape(-1), dlnb.reshape(-1))


def _mlp_ln_bwd_stored(eps, interpret, res, g):
    """Store-residual backward of the post-LN MLP half: LN statistics
    come from the saved pre-LN sum; the only recompute is fc1+GELU (one
    matmul, needed for the GELU derivative — the fc2 product is dead
    code under the vjp)."""
    x, w1, b1, w2, b2, hmask, lns, lnb, res_sum = res
    shape = x.shape
    C = shape[-1]
    dt = x.dtype
    x2 = x.reshape(-1, C)
    M = x2.shape[0]
    g2 = g.reshape(-1, C)
    res2 = res_sum[:M]

    if dt == jnp.bfloat16 and not env_flag("MVLT_NO_FUSED_BWD"):
        # fused backward kernel: LN vjp + fc1/GELU/fc2 vjp with the
        # (M, 4C) f32 intermediates VMEM-resident (H-chunked grid)
        h2 = hmask.reshape(-1, C) if hmask is not None else None
        dx2, dw1, db1, dw2, db2, dlns, dlnb = mlp_ln_half_bwd(
            x2, res2, g2, h2, w1, b1, w2, lns, eps=eps,
            interpret=interpret)
        dx = dx2.astype(dt).reshape(shape)
        out = (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
               dw2.astype(w2.dtype), db2.astype(b2.dtype))
        dh = None if hmask is None else jnp.zeros_like(hmask)
        return out, dh, dlns.astype(lns.dtype), dlnb.astype(lnb.dtype)

    def ln_piece(res_f, lns, lnb):
        return _ln(res_f, lns, lnb, eps=eps).astype(dt)

    _, vjp_ln = jax.vjp(ln_piece, res2, lns, lnb)
    dres, dlns, dlnb = vjp_ln(g2)

    dmlp = dres * hmask.reshape(-1, C).astype(jnp.float32) \
        if hmask is not None else dres

    approx_gelu = dt == jnp.bfloat16 and not interpret

    if dt == jnp.bfloat16:
        # kill-switch (MVLT_NO_FUSED_BWD) fallback: the hand-written
        # mixed-precision XLA backward — matmuls with bf16 operands +
        # f32 accumulation (f32-operand matmuls are emulated multi-pass
        # on the MXU), GELU derivative matching the forward kernel's
        # tanh fast path.
        def mm(a, b):
            return jnp.matmul(a, b, preferred_element_type=jnp.float32)

        a1 = mm(x2, w1) + b1
        m, vjp_gelu = jax.vjp(
            lambda a: jax.nn.gelu(a, approximate=approx_gelu), a1)
        md = m.astype(dt)
        dmlp_d = dmlp.astype(dt)
        dw2 = mm(md.T, dmlp_d)
        db2 = dmlp.sum(0)
        dm = mm(dmlp_d, w2.astype(dt).T)
        (da1,) = vjp_gelu(dm)
        da1_d = da1.astype(dt)
        dw1 = mm(x2.T, da1_d)
        db1 = da1.sum(0)
        dx2 = mm(da1_d, w1.astype(dt).T)
    else:
        def fc_piece(x2, w1, b1, w2, b2):
            m = jax.nn.gelu(
                jnp.matmul(x2, w1, preferred_element_type=jnp.float32) + b1,
                approximate=approx_gelu)
            return jnp.matmul(m.astype(dt), w2,
                              preferred_element_type=jnp.float32) + b2

        _, vjp_fc = jax.vjp(fc_piece, x2, w1, b1, w2, b2)
        dx2, dw1, db1, dw2, db2 = vjp_fc(dmlp)

    dx = (dx2.astype(jnp.float32) + dres).astype(dt).reshape(shape)
    out = (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
           dw2.astype(w2.dtype), db2.astype(b2.dtype))
    dh = None if hmask is None else jnp.zeros_like(hmask)
    return out, dh, dlns.astype(lns.dtype), dlnb.astype(lnb.dtype)


def _mlp_ln_bwd(eps, rows, interpret, res, g):
    (dx, dw1, db1, dw2, db2), _, dlns, dlnb = \
        _mlp_ln_bwd_stored(eps, interpret, res, g)
    return dx, dw1, db1, dw2, db2, dlns, dlnb


fused_mlp_ln.defvjp(_mlp_ln_fwd, _mlp_ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_mlp_ln_masked(x, w1, b1, w2, b2, hmask, lns, lnb,
                        eps: float = 1e-12, rows: int = 256,
                        interpret: bool = False):
    """Training variant of :func:`fused_mlp_ln`: ``hmask`` (B, N, C)
    multiplicative hidden-dropout mask applied to the fc2 output before
    the residual (HF Bert placement)."""
    return _mlp_ln_impl(x, w1, b1, w2, b2, hmask, lns, lnb, eps, rows,
                        interpret)


def _mlp_ln_masked_fwd(x, w1, b1, w2, b2, hmask, lns, lnb, eps, rows,
                       interpret):
    out, res_sum = _mlp_ln_impl(x, w1, b1, w2, b2, hmask, lns, lnb, eps,
                                rows, interpret, save_res=True)
    return out, (x, w1, b1, w2, b2, hmask, lns, lnb, res_sum)


def _mlp_ln_masked_bwd(eps, rows, interpret, res, g):
    (dx, dw1, db1, dw2, db2), dh, dlns, dlnb = \
        _mlp_ln_bwd_stored(eps, interpret, res, g)
    return dx, dw1, db1, dw2, db2, dh, dlns, dlnb


fused_mlp_ln_masked.defvjp(_mlp_ln_masked_fwd, _mlp_ln_masked_bwd)


# ---------------------------------------------------------------------------
# pre-LN Swin block halves for wide stages whose FULL block weights exceed
# VMEM (Swin-S stage 4: 12*768^2 bf16 = 14.2MB).  The block splits at its
# residual boundaries; each half's weights (4C^2 / 8C^2) fit comfortably.
#   attn half: x + proj(window_attention(qkv(LN1(x))))
#   mlp half:  y + fc2(gelu(fc1(LN2(y))))
# ---------------------------------------------------------------------------

def _attn_half_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                      wproj_ref, bproj_ref, bias_ref, o_ref, ctx_ref, *,
                      scale: float, num_heads: int, window_n: int,
                      fast: bool = False):
    GN, C = x_ref.shape
    N = window_n
    G = GN // N
    Gb = bias_ref.shape[0]
    Dh = C // num_heads

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    X = x_ref[:].astype(jnp.float32)
    H1 = _ln(X, ln1s_ref[:], ln1b_ref[:], fast=fast)
    QKV = dot(H1.astype(x_ref.dtype), wqkv_ref[:])
    QKV = (QKV + bqkv_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    base = pl.program_id(0) * G      # 1-D grid + full bias resident:
    for g in range(G):               # pattern index needs the grid offset
        rows = QKV[g * N:(g + 1) * N]
        for hh in range(num_heads):
            q = rows[:, hh * Dh:(hh + 1) * Dh]
            k = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            v = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            ctx = _attend(q, k, v, bias_ref[(base + g) % Gb, hh], fast,
                          scale)
            ctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh] = \
                ctx.astype(ctx_ref.dtype)
    attn = dot(ctx_ref[:], wproj_ref[:])
    o_ref[:] = (X + attn
                + bproj_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _attn_half_xla_ref(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                       scale, num_heads):
    xf = x.astype(jnp.float32)
    h = _ln(xf, ln1s, ln1b).astype(x.dtype)
    attn = _block_xla_ref(h, wqkv, bqkv, wproj, bproj, bias, scale,
                          num_heads).astype(jnp.float32)
    return (xf + attn).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def swin_attn_half(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                   scale: float, num_heads: int, group: int = 16,
                   interpret: bool = False):
    """Pre-LN Swin attention half: ``x + proj(attn(qkv(LN1(x))))``.
    x: (BW, N, C) windows; adjacent windows merge into block-diagonal
    pairs exactly as in :func:`swin_full_block`."""
    orig_shape = x.shape
    x, bias, merged = _merge_window_pairs(x, bias)
    BW, N, C = x.shape
    nWb = bias.shape[0]
    G = max(group // 2, 1) if merged else group
    # tight budget: the half-block weights (4C^2 bf16) already take a big
    # VMEM bite at wide C, so the value working set gets only ~4MB
    while G > 1 and ((G * N) % 8 != 0 or BW % G != 0
                     or (nWb > 1 and nWb % G != 0)
                     or G * N * C * (4 + 3 + 2) * 4 > 4 * 1024 * 1024):
        G //= 2
    if (G * N) % 8 != 0 or BW % G != 0 or (nWb > 1 and nWb % G != 0):
        out = _block_forward_with_ln_fallback(
            x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias, scale,
            num_heads, interpret)
        return out.reshape(orig_shape) if merged else out

    x2 = x.reshape(BW * N, C)
    grid = (BW // G,)
    x_spec = pl.BlockSpec((G * N, C), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    # full bias resident regardless of nWb (the kernel indexes patterns
    # with the grid offset)
    bias_spec = pl.BlockSpec(bias.shape, lambda i: (0,) * bias.ndim,
                             memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _attn_half_kernel, scale=scale, num_heads=num_heads,
            window_n=N, fast=(x.dtype == jnp.bfloat16 and not interpret)),
        grid=grid,
        in_specs=[x_spec, const_spec(ln1s.shape), const_spec(ln1b.shape),
                  const_spec(wqkv.shape), const_spec(bqkv.shape),
                  const_spec(wproj.shape), const_spec(bproj.shape),
                  bias_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((G * N, C), x.dtype)],
        interpret=interpret,
    )(x2, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias)
    out = out.reshape(BW, N, C)
    return out.reshape(orig_shape) if merged else out


def _block_forward_with_ln_fallback(x, ln1s, ln1b, wqkv, bqkv, wproj,
                                    bproj, bias, scale, num_heads,
                                    interpret):
    """XLA LN/residual around the (already merged) attention-only kernel."""
    xf = x.astype(jnp.float32)
    h = _ln(xf, ln1s, ln1b).astype(x.dtype)
    attn = _block_forward(h, wqkv, bqkv, wproj, bproj, bias, scale=scale,
                          num_heads=num_heads, group=16,
                          interpret=interpret)
    return (xf + attn.astype(jnp.float32)).astype(x.dtype)


def _attn_half_fwd(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias, scale,
                   num_heads, group, interpret):
    out = swin_attn_half(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                         scale, num_heads, group, interpret)
    return out, (x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias)


def _attn_half_bwd(scale, num_heads, group, interpret, res, g):
    x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias = res

    def ref(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias):
        return _attn_half_xla_ref(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                                  bias, scale, num_heads)

    _, vjp = jax.vjp(ref, x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias)
    return vjp(g)


swin_attn_half.defvjp(_attn_half_fwd, _attn_half_bwd)


def _mlp_preln_kernel(x_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref, *, fast: bool = False):
    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    X = x_ref[:].astype(jnp.float32)
    h = _ln(X, ln2s_ref[:], ln2b_ref[:], fast=fast)
    m = dot(h.astype(x_ref.dtype), w1_ref[:])
    m = m + b1_ref[:].astype(jnp.float32)
    m = _gelu_exact(m, fast)
    out = dot(m.astype(x_ref.dtype), w2_ref[:])
    o_ref[:] = (X + out + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _mlp_preln_xla_ref(x, ln2s, ln2b, w1, b1, w2, b2,
                       approx_gelu=False):
    shape = x.shape
    C = shape[-1]
    xf = x.reshape(-1, C).astype(jnp.float32)
    h = _ln(xf, ln2s, ln2b).astype(x.dtype)
    m = jax.nn.gelu((h @ w1).astype(jnp.float32) + b1,
                    approximate=approx_gelu)
    out = (m.astype(x.dtype) @ w2).astype(jnp.float32) + b2
    return (xf + out).astype(x.dtype).reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_mlp_preln(x, ln2s, ln2b, w1, b1, w2, b2, rows: int = 128,
                    interpret: bool = False):
    """Pre-LN MLP half: ``x + fc2(gelu(fc1(LN2(x))))``; row-chunked grid
    (rows are independent)."""
    shape = x.shape
    C = shape[-1]
    x2 = x.reshape(-1, C)
    M = x2.shape[0]
    R = rows
    if M % R != 0:
        # pad the row dim up to a whole chunk: big chunks keep the MXU
        # M-dimension full (a divisor search can degrade to tiny R)
        M_pad = -(-M // R) * R
        x2 = jnp.pad(x2, ((0, M_pad - M), (0, 0)))
        M = M_pad

    grid = (M // R,)
    x_spec = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def const_spec(shape_):
        return pl.BlockSpec(shape_, lambda i: (0,) * len(shape_),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_mlp_preln_kernel,
                          fast=(x.dtype == jnp.bfloat16 and not interpret)),
        grid=grid,
        in_specs=[x_spec, const_spec(ln2s.shape), const_spec(ln2b.shape),
                  const_spec(w1.shape), const_spec(b1.shape),
                  const_spec(w2.shape), const_spec(b2.shape)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2, ln2s, ln2b, w1, b1, w2, b2)
    return out[:x.size // C].reshape(shape)


def _mlp_preln_fwd(x, ln2s, ln2b, w1, b1, w2, b2, rows, interpret):
    out = fused_mlp_preln(x, ln2s, ln2b, w1, b1, w2, b2, rows, interpret)
    return out, (x, ln2s, ln2b, w1, b1, w2, b2)


def _mlp_preln_bwd(rows, interpret, res, g):
    x, ln2s, ln2b, w1, b1, w2, b2 = res
    approx = x.dtype == jnp.bfloat16 and not interpret

    def ref(x, ln2s, ln2b, w1, b1, w2, b2):
        return _mlp_preln_xla_ref(x, ln2s, ln2b, w1, b1, w2, b2,
                                  approx_gelu=approx)

    _, vjp = jax.vjp(ref, x, ln2s, ln2b, w1, b1, w2, b2)
    return vjp(g)


fused_mlp_preln.defvjp(_mlp_preln_fwd, _mlp_preln_bwd)


# ---------------------------------------------------------------------------
# wide-channel Swin block TRAINING path (stage 4 of Swin-S, stages 3-4 of
# Swin-B): the whole-block kernel's weights (12C^2) exceed VMEM, so the
# training forward splits at the natural residual seams into three
# VMEM-light pieces — row-chunked LN1+qkv projection, the attention core,
# and a fused proj/res1/LN2/MLP/res2 tail.  The seam tensors (QKV, ctx)
# are exactly the residuals the store-residual backward consumes
# (:func:`_stored_block_bwd`), so writing them to HBM costs nothing extra.
# Replaces the reference's torch autograd through SwinTransformerBlock
# (visual_feature_extractor.py:223-340) on wide stages.
# ---------------------------------------------------------------------------

def _ln_matmul_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref, o_ref, *,
                      eps: float, fast: bool):
    """o = LN(x) @ w + b on a row chunk (pre-LN qkv head)."""
    X = x_ref[:].astype(jnp.float32)
    H = _ln(X, lns_ref[:], lnb_ref[:], eps=eps, fast=fast)
    out = jax.lax.dot_general(H.astype(x_ref.dtype), w_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (out + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _swin_tail_kernel(x_ref, ctx_ref, wproj_ref, bproj_ref, ln2s_ref,
                      ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest,
                      eps: float, fast: bool, has_dp: bool):
    """res1 = x + dp1*(ctx@wproj + bproj); o = res1 + dp2*(mlp(LN2(res1)))
    on a row chunk — the forward mirror of :func:`_swin_mlp_bwd_kernel`'s
    recompute, so stored-backward gradients are consistent by
    construction."""
    rest = list(rest)
    dp1_ref = rest.pop(0) if has_dp else None
    dp2_ref = rest.pop(0) if has_dp else None
    (o_ref,) = rest

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    X = x_ref[:].astype(jnp.float32)
    attn = dot(ctx_ref[:], wproj_ref[:]) + bproj_ref[:].astype(jnp.float32)
    res1 = X + (attn * dp1_ref[:] if has_dp else attn)
    h2 = _ln(res1, ln2s_ref[:], ln2b_ref[:], eps=eps, fast=fast)
    m = dot(h2.astype(x_ref.dtype), w1_ref[:]) \
        + b1_ref[:].astype(jnp.float32)
    m = _gelu_exact(m, fast)
    out = dot(m.astype(x_ref.dtype), w2_ref[:]) \
        + b2_ref[:].astype(jnp.float32)
    o_ref[:] = (res1 + (out * dp2_ref[:] if has_dp else out)) \
        .astype(o_ref.dtype)


def _row_chunk_call(kernel, operands, row_operands, M, out_dims, out_dtypes,
                    rows, interpret, vmem_mb=28):
    """Shared plumbing for 1-D row-grid kernels: pads rows to a chunk
    multiple, row-blocks the (M, ·) operands in ``row_operands`` (by
    position) and broadcasts the rest."""
    R = rows
    M_pad = -(-M // R) * R
    ops = []
    in_specs = []
    for i, a in enumerate(operands):
        if i in row_operands:
            if a.shape[0] != M_pad:
                a = jnp.pad(a, ((0, M_pad - a.shape[0]), (0, 0)))
            in_specs.append(pl.BlockSpec((R, a.shape[1]), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(
                a.shape, (lambda nd: lambda i: (0,) * nd)(a.ndim),
                memory_space=pltpu.VMEM))
        ops.append(a)
    out_specs = tuple(pl.BlockSpec((R, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
                      for d in out_dims)
    out_shape = tuple(jax.ShapeDtypeStruct((M_pad, d), dt)
                      for d, dt in zip(out_dims, out_dtypes))
    if len(out_dims) == 1:
        out_specs, out_shape = out_specs[0], out_shape[0]
    out = pl.pallas_call(
        kernel, grid=(M_pad // R,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(*ops)
    outs = out if isinstance(out, tuple) else (out,)
    outs = tuple(o[:M] for o in outs)
    return outs if len(outs) > 1 else outs[0]


def _half_train_forward(x, params, bias, dp, scale, num_heads, interpret,
                        save_res):
    """Three-piece wide-C training forward; returns (out, qkv, ctx) flat
    (qkv/ctx are the stored-backward residuals)."""
    (ln1s, ln1b, wqkv, bqkv, wproj, bproj,
     ln2s, ln2b, w1, b1, w2, b2) = params
    BW, N, C = x.shape
    M = BW * N
    fast = x.dtype == jnp.bfloat16 and not interpret
    x2 = x.reshape(M, C)
    b_row = lambda a: a.reshape(1, -1)

    qkv2 = _row_chunk_call(
        functools.partial(_ln_matmul_kernel, eps=1e-5, fast=fast),
        [x2, b_row(ln1s), b_row(ln1b), wqkv, b_row(bqkv)], {0},
        M, (3 * C,), (x.dtype,), rows=128, interpret=interpret)

    ctx = attention_core(qkv2.reshape(BW, N, 3 * C), bias, scale,
                         num_heads, interpret=interpret)
    ctx2 = ctx.reshape(M, C)

    operands = [x2, ctx2, wproj, b_row(bproj), b_row(ln2s), b_row(ln2b),
                w1, b_row(b1), w2, b_row(b2)]
    row_ops = {0, 1}
    if dp is not None:
        operands += [dp[0], dp[1]]
        row_ops |= {10, 11}
    out2 = _row_chunk_call(
        functools.partial(_swin_tail_kernel, eps=1e-5, fast=fast,
                          has_dp=dp is not None),
        operands, row_ops, M, (C,), (x.dtype,), rows=128,
        interpret=interpret)
    out = out2.reshape(BW, N, C)
    if save_res:
        return out, qkv2, ctx2
    return out, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def swin_half_block(x, params, bias, dp, scale: float, num_heads: int,
                    interpret: bool = False):
    """Wide-channel Swin block for TRAINING: kernel forward in three
    VMEM-light pieces, store-residual backward (the same
    :func:`_stored_block_bwd` the whole-block kernel uses).

    x: (BW, N, C) windows; params as in :func:`swin_full_block`; bias the
    combined (nWb, nH, N, N) f32; ``dp`` None or ((BW*N, 1), (BW*N, 1))
    f32 DropPath multipliers."""
    out, _, _ = _half_train_forward(x, tuple(params), bias, dp, scale,
                                    num_heads, interpret, save_res=False)
    return out


def _swin_half_block_fwd(x, params, bias, dp, scale, num_heads, interpret):
    out, qkv, ctx = _half_train_forward(x, tuple(params), bias, dp, scale,
                                        num_heads, interpret, save_res=True)
    return out, (x, tuple(params), bias, dp, qkv, ctx)


def _swin_half_block_bwd(scale, num_heads, interpret, res, g):
    x, params, bias, dp, qkv, ctx = res
    interp = interpret or jax.default_backend() != "tpu"
    return _stored_block_bwd(x, params, bias, dp, qkv, ctx, g, scale,
                             num_heads, interp)


swin_half_block.defvjp(_swin_half_block_fwd, _swin_half_block_bwd)


# ---------------------------------------------------------------------------
# attention-core forward/backward kernels (training path).
#
# XLA's backward through window attention re-materializes the per-window
# (N, N) weight/jacobian tensors through HBM with 49-lane padding — the
# same pathology the forward kernels fixed.  These kernels compute the
# core (softmax(QK^T + bias) V) and its VJP entirely in VMEM; the
# surrounding projections (dW = X^T dQKV etc.) stay in XLA where they are
# large efficient matmuls.  Used by the custom VJPs of the block kernels.
# ---------------------------------------------------------------------------

def _core_fwd_kernel(qkv_ref, bias_ref, o_ref, *, scale: float,
                     num_heads: int, fast: bool = False):
    G, N, C3 = qkv_ref.shape
    C = C3 // 3
    Gb = bias_ref.shape[0]
    Dh = C // num_heads
    # The grid is 1-D over ALL windows (batch-major) with the full bias
    # pattern set resident, so the pattern index must include the grid
    # offset: window (i*G + g) uses pattern (i*G + g) % Gb.  `g % Gb`
    # alone is only right when Gb | G — with G < Gb (merged shifted
    # stages) it silently applies the wrong shift mask.
    base = pl.program_id(0) * G
    for g in range(G):
        rows = qkv_ref[g]
        for hh in range(num_heads):
            q = rows[:, hh * Dh:(hh + 1) * Dh]
            k = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            v = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            ctx = _attend(q, k, v, bias_ref[(base + g) % Gb, hh], fast,
                          scale)
            o_ref[g, :, hh * Dh:(hh + 1) * Dh] = ctx.astype(o_ref.dtype)


def _core_bwd_kernel(qkv_ref, dctx_ref, bias_ref, dqkv_ref, dbias_ref,
                     p_ref, dp_ref, *, scale: float, num_heads: int,
                     fast: bool = False):
    """Two-pass structure: pass A computes softmax p and dp = dctx V^T for
    EVERY (window-group, head) into VMEM scratch; pass B does the gradient
    dots.  Splitting the per-head MXU->VPU->MXU dependency chain into two
    phases lets Mosaic overlap the softmax VPU work of one head with the
    matmuls of another (measured ~20-25% over the single-pass form at all
    Swin stage geometries; identical per-element math, so bit-exact)."""
    G, N, C3 = qkv_ref.shape
    C = C3 // 3
    Gb = bias_ref.shape[0]
    Dh = C // num_heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    ones = jnp.ones((N, 1), jnp.float32)
    base = pl.program_id(0) * G      # see _core_fwd_kernel pattern note

    dt = qkv_ref.dtype
    # pass A: p (softmax probs, f32) and dp (dctx V^T) per (g, head)
    for g in range(G):
        rows = qkv_ref[g]
        for hh in range(num_heads):
            # dtype-native dot operands (the v5e MXU is bf16-native; f32
            # matmuls are emulated multi-pass): scale folds into the f32
            # scores after the dot.  The slow path keeps the original
            # all-f32 dots (interpret/f32 tests bit-tight).
            qd = rows[:, hh * Dh:(hh + 1) * Dh]
            kd = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            vd = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            dctx_d = dctx_ref[g, :, hh * Dh:(hh + 1) * Dh]
            if fast:
                s = jax.lax.dot_general(qd, kd, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s * scale + bias_ref[(base + g) % Gb, hh]
                # overflow-clamp softmax, EXACTLY as the fast forward
                # (_attend): no row-max lane reduce, and the recomputed p
                # matches the forward's p bit-for-bit so the gradient is
                # consistent with the function actually evaluated.
                e = jnp.exp(jnp.minimum(s, 60.0))
            else:
                qd = qd.astype(jnp.float32) * scale
                kd = kd.astype(jnp.float32)
                vd = vd.astype(jnp.float32)
                dctx_d = dctx_d.astype(jnp.float32)
                s = jax.lax.dot_general(qd, kd, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s + bias_ref[(base + g) % Gb, hh]
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
            denom = jax.lax.dot_general(e, ones, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            if fast:
                p = e * pl.reciprocal(jnp.maximum(denom, 1e-30), approx=True)
            else:
                p = e / denom
            # dp = dctx V^T   (lane-lane contraction)
            dp = jax.lax.dot_general(dctx_d, vd, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            p_ref[g * num_heads + hh] = p
            dp_ref[g * num_heads + hh] = dp
    # pass B: dv / ds / dq / dk / dbias per (g, head)
    for g in range(G):
        rows = qkv_ref[g]
        for hh in range(num_heads):
            qd = rows[:, hh * Dh:(hh + 1) * Dh]
            kd = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            dctx_d = dctx_ref[g, :, hh * Dh:(hh + 1) * Dh]
            if not fast:
                qd = qd.astype(jnp.float32) * scale
                kd = kd.astype(jnp.float32)
                dctx_d = dctx_d.astype(jnp.float32)
            p = p_ref[g * num_heads + hh]
            dp = dp_ref[g * num_heads + hh]
            pd = p.astype(dt) if fast else p
            # dv = P^T dctx   (row-row contraction)
            dv = jax.lax.dot_general(pd, dctx_d, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            pdp = p * dp
            rd = jax.lax.dot_general(pdp, ones, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = pdp - p * rd
            dsd = ds.astype(dt) if fast else ds
            if fast:
                dq = jax.lax.dot_general(
                    dsd, kd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dk = jax.lax.dot_general(
                    dsd, qd, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            else:
                # slow path: qd already carries scale (dk inherits it;
                # dq scales explicitly) — original ordering, bit-exact
                dq = jax.lax.dot_general(
                    dsd, kd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dk = jax.lax.dot_general(
                    dsd, qd, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dqkv_ref[g, :, hh * Dh:(hh + 1) * Dh] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[g, :, C + hh * Dh:C + (hh + 1) * Dh] = \
                dk.astype(dqkv_ref.dtype)
            dqkv_ref[g, :, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh] = \
                dv.astype(dqkv_ref.dtype)
            dbias_ref[(base + g) % Gb, hh] += ds


def _core_bwd_from_p(p, dp, pd, qd, kd, dctx_d, dsd_dtype, scale_dq,
                     scale_dk, ones):
    """Shared per-head backward-from-softmax tail (dv / ds / dq / dk).

    Used by BOTH :func:`_core_bwd_kernel2d` (recompute path) and
    :func:`_core_bwd_storep_kernel` (stored-p path) so dtype/scale fixes
    cannot silently diverge.  ``pd`` is p in the dtype for the dv matmul;
    ``scale_dq``/``scale_dk`` absorb the two paths' conventions (the
    recompute slow path pre-scales q, so its dk omits the scale)."""
    dv = jax.lax.dot_general(pd, dctx_d, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    pdp = p * dp
    rd = jax.lax.dot_general(pdp, ones, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = pdp - p * rd
    dsd = ds.astype(dsd_dtype)
    dq = jax.lax.dot_general(dsd, kd, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale_dq
    dk = jax.lax.dot_general(dsd, qd, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if scale_dk != 1.0:
        dk = dk * scale_dk
    return dq, dk, dv, ds


def _store_head_grads(dqkv_ref, dbias_ref, g, hh, N, C, Dh, dq, dk, dv,
                      ds, bias_row):
    sl = slice(g * N, (g + 1) * N)
    dqkv_ref[sl, hh * Dh:(hh + 1) * Dh] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[sl, C + hh * Dh:C + (hh + 1) * Dh] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[sl, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh] = \
        dv.astype(dqkv_ref.dtype)
    dbias_ref[bias_row, hh] += ds


def _core_bwd_kernel2d(qkv_ref, dctx_ref, bias_ref, dqkv_ref, dbias_ref,
                       p_ref, dp_ref, *, seq_n: int, scale: float,
                       num_heads: int, fast: bool = False):
    """:func:`_core_bwd_kernel` on FLAT 2-D (G*N, ·) blocks (value slices
    pick windows) — same two-pass structure and per-element math.  The
    2-D layout matters at N % 8 != 0 window geometries: a (BW, N, 3C)
    tiled array pads every window panel to the sublane multiple, so the
    XLA reshape from the flat stored-residual layout is a real relayout
    copy (~0.25 ms per 58MB operand at Swin stage 1)."""
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
    base = pl.program_id(0) * G      # see _core_fwd_kernel pattern note
    dt = qkv_ref.dtype
    for g in range(G):
        rows = qkv_ref[g * N:(g + 1) * N]
        for hh in range(num_heads):
            qd = rows[:, hh * Dh:(hh + 1) * Dh]
            kd = rows[:, C + hh * Dh:C + (hh + 1) * Dh]
            vd = rows[:, 2 * C + hh * Dh:2 * C + (hh + 1) * Dh]
            dctx_d = dctx_ref[g * N:(g + 1) * N, hh * Dh:(hh + 1) * Dh]
            if fast:
                s = jax.lax.dot_general(qd, kd, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s * scale + bias_ref[(base + g) % Gb, hh]
                e = jnp.exp(jnp.minimum(s, 60.0))
            else:
                qd = qd.astype(jnp.float32) * scale
                kd = kd.astype(jnp.float32)
                vd = vd.astype(jnp.float32)
                dctx_d = dctx_d.astype(jnp.float32)
                s = jax.lax.dot_general(qd, kd, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s + bias_ref[(base + g) % Gb, hh]
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
            denom = jax.lax.dot_general(e, ones, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            if fast:
                p = e * pl.reciprocal(jnp.maximum(denom, 1e-30), approx=True)
            else:
                p = e / denom
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
            if not fast:
                qd = qd.astype(jnp.float32) * scale
                kd = kd.astype(jnp.float32)
                dctx_d = dctx_d.astype(jnp.float32)
            p = p_ref[g * num_heads + hh]
            dp = dp_ref[g * num_heads + hh]
            pd = p.astype(dt) if fast else p
            # slow path pre-scaled qd, so dk carries no extra scale there
            dq, dk, dv, ds = _core_bwd_from_p(
                p, dp, pd, qd, kd, dctx_d,
                dsd_dtype=dt if fast else jnp.float32,
                scale_dq=scale, scale_dk=scale if fast else 1.0, ones=ones)
            _store_head_grads(dqkv_ref, dbias_ref, g, hh, N, C, Dh,
                              dq, dk, dv, ds, (base + g) % Gb)


def _core_bwd_storep_kernel(p_ref, qkv_ref, dctx_ref, dqkv_ref, dbias_ref,
                            *, seq_n: int, scale: float, num_heads: int):
    """Single-pass attention-core backward consuming the STORED softmax
    (saved by the forward's ``store_p`` mode) instead of recomputing
    QK^T + exp — measured -30% at stage-3 geometry
    (scripts/probe_core_p.py).  Bit-differences vs the recompute path
    come only from p's storage dtype (bf16 on the fast path)."""
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
            dq, dk, dv, ds = _core_bwd_from_p(
                p, dp, pd, qd, kd, dctx_d, dsd_dtype=dt,
                scale_dq=scale, scale_dk=scale, ones=ones)
            _store_head_grads(dqkv_ref, dbias_ref, g, hh, N, C, Dh,
                              dq, dk, dv, ds, (base + g) % Gb)


def attention_core_bwd_flat(qkv2, dctx2, bias, n: int, scale: float,
                            num_heads: int, interpret: bool = False,
                            p2=None):
    """:func:`attention_core_bwd` on FLAT stored-residual rows.

    qkv2: (BW*n, 3C); dctx2: (BW*n, C); bias: (nWb, nH, n, n).  Returns
    (dqkv2 (BW*n, 3C), dbias).  Never materializes the (BW, n, 3C) tiled
    form (a real relayout copy when n % 8 != 0 — Swin windows are n=49).
    Window-pair merging is pure row REINTERPRETATION here (flat layouts
    are identical).  Falls back to the 3-D kernel when no sublane-aligned
    group size fits VMEM (e.g. Swin stage 4: C=768, nH=24)."""
    M, C3 = qkv2.shape
    C = C3 // 3
    BW = M // n
    nWb0 = bias.shape[0]
    if _can_merge_pairs(n, BW, nWb0):  # same predicate as the forward
        N, BWm, bias_m, merged = 2 * n, BW // 2, _merge_bias_pairs(bias), True
    else:
        N, BWm, bias_m, merged = n, BW, bias, False
    nWb = bias_m.shape[0]

    bias_spec = pl.BlockSpec(bias_m.shape, lambda i: (0,) * bias_m.ndim,
                             memory_space=pltpu.VMEM)

    def unmerge(dqkv2, dbias_m):
        if merged:
            top = dbias_m[:, :, :n, :n]
            bot = dbias_m[:, :, n:, n:]
            if nWb0 == 1:
                dbias = (top + bot).astype(jnp.float32)
            else:
                dbias = jnp.stack([top, bot], axis=1).reshape(
                    nWb0, dbias_m.shape[1], n, n)
        else:
            dbias = dbias_m
        return dqkv2, dbias.astype(jnp.float32)

    # stored-p single-pass backward (reached only when the forward
    # stored p — itself opt-in): no QK^T/exp recompute, no p/dp VMEM
    # scratch round-trips (-30% at stage-3 geometry).  The kernel never
    # READS bias, so the recompute kernel's pattern-alignment rule
    # (nWb % G == 0) is unnecessary here — dbias rows are indexed
    # dynamically per merged window.  That admits the SW-MSA merged
    # geometry (nWb = 2 patterns, N = 98) whose only 8-aligned groups
    # (G % 4 == 0) the recompute rule below rejects.
    use_p = p2 is not None and not env_flag("MVLT_NO_STOREP")
    if use_p and p2.shape != (BWm * num_heads, N, N):
        _warn_storep_unused(
            f"stored p shape {p2.shape} != {(BWm * num_heads, N, N)}")
        use_p = False
    if use_p and not env_flag("MVLT_NO_CORE2D"):
        def ok_p(G):
            return (BWm % G == 0 and (G * N) % 8 == 0
                    and G * (N * C3 * 12
                             + num_heads * N * N * p2.dtype.itemsize)
                    <= 10 * 1024 * 1024)

        Gp = 8
        while Gp > 1 and not ok_p(Gp):
            Gp //= 2
        if not ok_p(Gp):
            _warn_storep_unused("no VMEM-admissible storep group")
        else:
            spec2p = lambda c: pl.BlockSpec((Gp * N, c), lambda i: (i, 0),
                                            memory_space=pltpu.VMEM)
            p_spec = pl.BlockSpec((Gp * num_heads, N, N),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
            dqkv2, dbias_m = pl.pallas_call(
                functools.partial(_core_bwd_storep_kernel, seq_n=N,
                                  scale=scale, num_heads=num_heads),
                grid=(BWm // Gp,),
                in_specs=[p_spec, spec2p(C3), spec2p(C)],
                out_specs=(spec2p(C3), bias_spec),
                out_shape=(jax.ShapeDtypeStruct((M, C3), qkv2.dtype),
                           jax.ShapeDtypeStruct(bias_m.shape,
                                                jnp.float32)),
                interpret=interpret,
            )(p2, qkv2, dctx2)
            return unmerge(dqkv2, dbias_m)

    def ok(G):
        # block rows must be sublane-aligned; VMEM: value blocks (the
        # usual 12-bytes/elem heuristic) + the two-pass p/dp scratch
        return (BWm % G == 0 and (nWb == 1 or nWb % G == 0)
                and (G * N) % 8 == 0
                and G * (N * C3 * 12 + 2 * num_heads * N * N * 4)
                <= 10 * 1024 * 1024)

    G = 8
    while G > 1 and not ok(G):
        G //= 2
    if not ok(G) or env_flag("MVLT_NO_CORE2D"):
        if use_p:
            _warn_storep_unused("no VMEM-admissible 2-D group")
        dqkv, dbias = attention_core_bwd(
            qkv2.reshape(BW, n, C3), dctx2.reshape(BW, n, C), bias,
            scale, num_heads, interpret=interpret)
        return dqkv.reshape(M, C3), dbias

    spec2 = lambda c: pl.BlockSpec((G * N, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    dqkv2, dbias_m = pl.pallas_call(
        functools.partial(
            _core_bwd_kernel2d, seq_n=N, scale=scale,
            num_heads=num_heads,
            fast=(qkv2.dtype == jnp.bfloat16 and not interpret)),
        grid=(BWm // G,),
        in_specs=[spec2(C3), spec2(C), bias_spec],
        out_specs=(spec2(C3), bias_spec),
        out_shape=(jax.ShapeDtypeStruct((M, C3), qkv2.dtype),
                   jax.ShapeDtypeStruct(bias_m.shape, jnp.float32)),
        scratch_shapes=[pltpu.VMEM((G * num_heads, N, N), jnp.float32),
                        pltpu.VMEM((G * num_heads, N, N), jnp.float32)],
        interpret=interpret,
    )(qkv2, dctx2, bias_m)
    return unmerge(dqkv2, dbias_m)


def _core_merge(qkv, bias):
    BW, N, C3 = qkv.shape
    nWb = bias.shape[0]
    if N > 64 or BW % 2 != 0 or (nWb > 1 and nWb % 2 != 0):
        return qkv, bias, False
    return qkv.reshape(BW // 2, 2 * N, C3), _merge_bias_pairs(bias), True


def _core_pick_group(BW, N, C3, nWb, group=8, extra_per_g=0):
    """``extra_per_g``: additional VMEM bytes per window-group beyond the
    value blocks (e.g. the two-pass backward's p/dp scratch planes)."""
    G = group
    while G > 1 and (BW % G != 0 or (nWb > 1 and nWb % G != 0)
                     or G * (N * C3 * 12 + extra_per_g) > 4 * 1024 * 1024):
        G //= 2
    while BW % G != 0 or (nWb > 1 and nWb % G != 0):
        G //= 2
    return max(G, 1)


def attention_core(qkv, bias, scale: float, num_heads: int,
                   interpret: bool = False):
    """softmax(Q K^T * scale + bias) V on fused-qkv windows.

    qkv: (BW, N, 3C); bias: (nWb, nH, N, N).  Returns ctx (BW, N, C)."""
    BW, N, C3 = qkv.shape
    C = C3 // 3
    orig = (BW, N, C)
    qkv, bias, merged = _core_merge(qkv, bias)
    BW, N, _ = qkv.shape
    nWb = bias.shape[0]
    G = _core_pick_group(BW, N, C3, nWb)

    spec3 = lambda c: pl.BlockSpec((G, N, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(bias.shape, lambda i: (0,) * bias.ndim,
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_core_fwd_kernel, scale=scale,
                          num_heads=num_heads,
                          fast=(qkv.dtype == jnp.bfloat16 and not interpret)),
        grid=(BW // G,),
        in_specs=[spec3(C3), bias_spec],
        out_specs=spec3(C),
        out_shape=jax.ShapeDtypeStruct((BW, N, C), qkv.dtype),
        interpret=interpret,
    )(qkv, bias)
    return out.reshape(orig)


def attention_core_bwd(qkv, dctx, bias, scale: float, num_heads: int,
                       interpret: bool = False):
    """VJP of :func:`attention_core` wrt (qkv, bias).

    Returns (dqkv (BW, N, 3C), dbias (nWb, nH, N, N)).  dbias accumulates
    across the sequential grid into a constant-index output block."""
    BW0, N0, C3 = qkv.shape
    C = C3 // 3
    nWb0 = bias.shape[0]
    qkv, bias_m, merged = _core_merge(qkv, bias)
    if merged:
        dctx = dctx.reshape(qkv.shape[0], qkv.shape[1], C)
    BW, N, _ = qkv.shape
    nWb = bias_m.shape[0]
    # Same group sizes as the forward: the two p/dp f32 scratch planes fit
    # on top of the value blocks at every Swin stage geometry (worst case
    # 3.7MB at stage 4's G=1, nH=24), and the measured two-pass win was
    # at these G values.
    G = _core_pick_group(BW, N, C3, nWb)

    spec3 = lambda c: pl.BlockSpec((G, N, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(bias_m.shape, lambda i: (0,) * bias_m.ndim,
                             memory_space=pltpu.VMEM)
    dqkv, dbias_m = pl.pallas_call(
        functools.partial(_core_bwd_kernel, scale=scale,
                          num_heads=num_heads,
                          fast=(qkv.dtype == jnp.bfloat16 and not interpret)),
        grid=(BW // G,),
        in_specs=[spec3(C3), spec3(C), bias_spec],
        out_specs=(spec3(C3), bias_spec),
        out_shape=(jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
                   jax.ShapeDtypeStruct(bias_m.shape, jnp.float32)),
        scratch_shapes=[pltpu.VMEM((G * num_heads, N, N), jnp.float32),
                        pltpu.VMEM((G * num_heads, N, N), jnp.float32)],
        interpret=interpret,
    )(qkv, dctx, bias_m)

    dqkv = dqkv.reshape(BW0, N0, C3)
    if merged:
        top = dbias_m[:, :, :N0, :N0]
        bot = dbias_m[:, :, N0:, N0:]
        if nWb0 == 1:
            dbias = (top + bot).astype(jnp.float32)
        else:
            dbias = jnp.stack([top, bot], axis=1).reshape(
                nWb0, dbias_m.shape[1], N0, N0)
    else:
        dbias = dbias_m
    return dqkv, dbias.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def attention_core_op(qkv, bias, scale: float, num_heads: int,
                      interpret: bool = False):
    """Differentiable attention core: forward and VJP both run as Pallas
    kernels (XLA's backward at window shapes re-materializes padded
    per-window jacobians through HBM).  Compose this inside otherwise-XLA
    reference functions to get fast recompute-style backwards."""
    return attention_core(qkv, bias, scale, num_heads, interpret)


def _core_op_fwd(qkv, bias, scale, num_heads, interpret):
    out = attention_core(qkv, bias, scale, num_heads, interpret)
    return out, (qkv, bias)


def _core_op_bwd(scale, num_heads, interpret, res, g):
    qkv, bias = res
    dqkv, dbias = attention_core_bwd(qkv, g.astype(qkv.dtype), bias, scale,
                                     num_heads, interpret)
    return dqkv, dbias.astype(bias.dtype)


attention_core_op.defvjp(_core_op_fwd, _core_op_bwd)


def _full_ref_fastcore(x, params, bias, dp, scale, num_heads, interpret,
                       shift_spec=None):
    """Whole-Swin-block reference with the attention core as a Pallas op
    (used for backward recompute: big matmuls/LN stay XLA, the core and
    its VJP run in VMEM).  ``bias`` is the combined (nWb, nH, N, N) array
    or the (rel, mask) tuple of the shift path; ``dp`` is None or
    per-row DropPath multipliers ((BW*N, 1), (BW*N, 1))."""
    if isinstance(bias, tuple):
        rel, mask = bias
        bias = rel + mask[:, None]
    BW, N, C = x.shape

    if shift_spec is not None:
        H, W, window, shift = shift_spec
        nW = (H // window) * (W // window)
        perm = jnp.asarray(_shift_perm(H, W, window, shift))
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))
        xi = x.reshape(-1, nW * N, C)
        x_in = jnp.take(xi, perm, axis=1).reshape(BW, N, C)
        if dp is not None:
            # permute the per-row multipliers alongside x so generic
            # per-row callers stay forward/backward consistent.  (The
            # kernel itself uses dp UNPERMUTED — valid only for the
            # per-image-constant multipliers DropPath produces, where the
            # within-image permutation is the identity; this reference
            # keeps the general semantics so the parity test proves the
            # identity claim rather than assuming it.)
            dp = tuple(
                jnp.take(d.reshape(-1, nW * N, 1), perm, axis=1)
                .reshape(BW * N, 1) for d in dp)
    else:
        x_in = x

    ln1s, ln1b, wqkv, bqkv, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2 = params
    xf = x_in.astype(jnp.float32)
    h1 = _ln(xf, ln1s, ln1b).astype(x.dtype)
    QKV = (h1.reshape(-1, C) @ wqkv + bqkv).reshape(BW, N, 3 * C)
    ctx = attention_core_op(QKV, bias, scale, num_heads, interpret)
    attn = (ctx.reshape(-1, C) @ wproj).astype(jnp.float32) + bproj
    attn = attn.reshape(BW, N, C)
    if dp is not None:
        attn = attn * dp[0].reshape(BW, N, 1)
    res1 = xf + attn
    h2 = _ln(res1, ln2s, ln2b).astype(x.dtype)
    m = jax.nn.gelu((h2.reshape(-1, C) @ w1).astype(jnp.float32) + b1,
                    approximate=(x.dtype == jnp.bfloat16 and not interpret))
    mlp = (m.astype(x.dtype) @ w2).astype(jnp.float32) + b2
    mlp = mlp.reshape(BW, N, C)
    if dp is not None:
        mlp = mlp * dp[1].reshape(BW, N, 1)
    y = (res1 + mlp).astype(x.dtype)

    if shift_spec is not None:
        yi = y.reshape(-1, nW * N, C)
        y = jnp.take(yi, inv, axis=1).reshape(BW, N, C)
    return y
