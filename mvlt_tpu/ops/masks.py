"""Attention-mask construction as pure functions.

Reproduces the reference's mask semantics exactly
(``modules/model.py:74-183``), including its quirks:

- bidirectional mode uses a 2-D *key* mask ``[1, image_mask, 1, text_mask]``
  (model.py:125-128);
- seq2seq (UniLM) mode is a causal lower-triangle with every column of the
  image prefix (col <= obj_end) forced visible (model.py:118-123) — note the
  reference IGNORES text padding in this mode, and we keep that behavior;
- masks become additive biases via ``(1 - m) * -10000.0`` (model.py:182),
  NOT -inf;
- the incremental decode branch feeds 2 query rows (prev token + [MASK])
  whose mask is the last 2 rows of the full causal matrix (model.py:96-104).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

NEG_BIAS = -10000.0


def bidirectional_key_mask(image_mask: jnp.ndarray,
                           text_mask: jnp.ndarray | None) -> jnp.ndarray:
    """(B, S) bool key mask for [CLS] + image + [SEP] (+ text)."""
    batch = image_mask.shape[0]
    ones = jnp.ones((batch, 1), dtype=bool)
    parts = [ones, image_mask.astype(bool), ones]
    if text_mask is not None:
        parts.append(text_mask.astype(bool))
    return jnp.concatenate(parts, axis=1)


def seq2seq_fusion_mask(batch: int, obj_end: int, total_len: int) -> jnp.ndarray:
    """(B, S, S) bool: causal, with image-prefix columns fully visible."""
    row = lax.broadcasted_iota(jnp.int32, (total_len, total_len), 0)
    col = lax.broadcasted_iota(jnp.int32, (total_len, total_len), 1)
    mask = (col <= row) | (col <= obj_end)
    return jnp.broadcast_to(mask[None], (batch, total_len, total_len))


def decode_step_mask(batch: int, num_queries: int, cache_len: int,
                     write_pos: jnp.ndarray) -> jnp.ndarray:
    """(B, num_queries, cache_len) bool mask for incremental decoding.

    Query i sits at absolute position ``write_pos + i``; it may attend all
    cache slots with absolute position <= its own.  Slots beyond the
    currently-written region are masked out by the position comparison
    (uncommitted slots live at positions > write_pos + num_queries - 1).
    """
    q_pos = write_pos + lax.broadcasted_iota(jnp.int32, (num_queries, cache_len), 0)
    k_pos = lax.broadcasted_iota(jnp.int32, (num_queries, cache_len), 1)
    mask = k_pos <= q_pos
    return jnp.broadcast_to(mask[None], (batch, num_queries, cache_len))


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Additive attention bias with the reference's -10000.0 fill.

    2-D (B, S_k) -> (B, 1, 1, S_k); 3-D (B, S_q, S_k) -> (B, 1, S_q, S_k).
    """
    if mask.ndim == 2:
        ext = mask[:, None, None, :]
    elif mask.ndim == 3:
        ext = mask[:, None, :, :]
    else:
        raise ValueError(f"bad mask ndim {mask.ndim}")
    return (1.0 - ext.astype(dtype)) * jnp.asarray(NEG_BIAS, dtype)
