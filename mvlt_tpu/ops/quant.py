"""Weight-only int8 quantization for serving (opt-in).

Symmetric per-output-channel max-abs quantization of the big 2-D
kernels: each selected ``(in, out)`` kernel is stored as an ``int8``
array plus one ``float32`` scale per output channel.  Dequantization
happens INSIDE the jitted serving function, so the resident copy of the
weights in HBM is the int8 one — the serving memory footprint of the
quantized tensors halves vs bf16 (4x vs f32).  Compute stays bf16 on
the MXU (weight-only: activations are never quantized), so results
track the bf16 baseline to quantization error, bounded per-tensor by
``scale/2`` per element.

This is the TPU-serving counterpart of the reference's fp16 inference
path (the reference has no int8 path; this is an extension).  In this
harness decode latency is dispatch-bound and batch forward is
compute-bound, so the win here is memory (larger serving batches / more
resident models), not step time — measured deltas are recorded in
PERF.md.

Opt-in: ``--quant int8w`` on the eval drivers, or
``eval_caption(..., quant="int8w")``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# marker key: a quantized leaf is a dict {_INT8: int8 array, _SCALE: f32}
_INT8 = "__int8w__"
_SCALE = "__int8w_scale__"


def quantize_int8(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel (last axis) int8 quantization.

    Returns ``(q, scale)`` with ``q`` int8 and ``scale`` float32 of
    shape ``w.shape[-1:]`` such that ``q * scale ~= w`` and
    ``|q * scale - w| <= scale / 2`` elementwise.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=tuple(range(w.ndim - 1)))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_int8(q: jax.Array, scale: jax.Array,
                    dtype=jnp.bfloat16) -> jax.Array:
    """Inverse of :func:`quantize_int8` (dequantize in f32, then cast)."""
    return (q.astype(jnp.float32) * scale).astype(dtype)


def default_predicate(path: Tuple[Any, ...], leaf: jax.Array) -> bool:
    """Quantize 2-D kernels/embeddings with both dims >= 64 — the
    weight-traffic-dominant tensors (qkv/proj/MLP/vocab).  LN params,
    biases, and tiny tables stay in their original dtype."""
    if leaf.ndim != 2 or min(leaf.shape) < 64:
        return False
    return True


def quantize_tree(params, predicate: Optional[Callable] = None,
                  scope: Optional[Callable] = None):
    """Replace selected array leaves of ``params`` with
    ``{_INT8: q, _SCALE: scale}`` dicts (still a valid pytree, so it
    can be passed into jit; the resident arrays are int8 + f32 scales).

    ``predicate(path, leaf)``: which arrays to quantize (default:
    :func:`default_predicate`).  ``scope(path)``: optional subtree
    filter (e.g. only the fusion encoder), applied on the key path.
    Returns ``(qtree, n_quantized)``.
    """
    predicate = predicate or default_predicate
    count = 0

    def visit(path, leaf):
        nonlocal count
        keys = tuple(getattr(p, "key", getattr(p, "idx", p)) for p in path)
        if scope is not None and not scope(keys):
            return leaf
        if not predicate(keys, leaf):
            return leaf
        q, s = quantize_int8(leaf)
        count += 1
        return {_INT8: q, _SCALE: s}

    qtree = jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: isinstance(x, jax.Array)
        or hasattr(x, "shape"))
    return qtree, count


def quantize_tree_jit(params, predicate: Optional[Callable] = None,
                      scope: Optional[Callable] = None):
    """:func:`quantize_tree` compiled as ONE device program.  Eager
    per-tensor quantization dispatches hundreds of tiny ops (ruinous on
    dispatch-floor-heavy runtimes); this traces the whole tree once.
    Returns ``(qtree, n_quantized)``."""
    count = 0

    def run(p):
        nonlocal count
        qt, count = quantize_tree(p, predicate, scope)
        return qt

    qtree = jax.jit(run)(params)
    return qtree, count


def dequantize_tree(qtree, dtype=jnp.bfloat16):
    """Reconstruct a dense params tree from :func:`quantize_tree` output.
    Safe to call inside jit — XLA materializes bf16 temporaries for the
    current step while the int8 originals stay resident."""

    def is_q(x):
        return isinstance(x, dict) and _INT8 in x

    return jax.tree_util.tree_map(
        lambda x: dequantize_int8(x[_INT8], x[_SCALE], dtype)
        if is_q(x) else x,
        qtree, is_leaf=lambda x: is_q(x) or isinstance(x, jax.Array)
        or hasattr(x, "shape"))


def quantized_bytes(qtree) -> Tuple[int, int]:
    """(quantized_bytes, original_bf16_bytes) over the quantized leaves —
    the serving-memory saving this transform buys."""
    qb = ob = 0
    for leaf in jax.tree_util.tree_leaves(
            qtree, is_leaf=lambda x: isinstance(x, dict) and _INT8 in x):
        if isinstance(leaf, dict) and _INT8 in leaf:
            n = leaf[_INT8].size
            qb += n + leaf[_SCALE].size * 4
            ob += n * 2
    return qb, ob
