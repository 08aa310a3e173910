"""One attention kernel family for the whole framework.

Every attention in MVLT-TPU (fusion encoder, Swin windows, ViT, decode
steps) funnels through :func:`multi_head_attention`, which selects between
an XLA einsum path and the Pallas flash kernel (``mvlt_tpu.ops.pallas_attn``)
based on shape/platform.  Scores and softmax are always computed in f32
regardless of compute dtype.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from mvlt_tpu.utils.env import env_flag


def _use_pallas(q: jnp.ndarray, k: jnp.ndarray,
                bias: Optional[jnp.ndarray]) -> bool:
    if env_flag("MVLT_DISABLE_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    # Flash path handles seq lens that tile well; small fusion seqs (<=512)
    # are fine on the einsum path, large batches of windows benefit.
    s_q = q.shape[-2]
    s_k = bias.shape[-1] if bias is not None else k.shape[-2]
    return s_q >= 128 and s_k >= 128


def reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        bias: Optional[jnp.ndarray] = None,
                        *, scale: Optional[float] = None,
                        dropout_rate: float = 0.0,
                        dropout_rng=None,
                        deterministic: bool = True) -> jnp.ndarray:
    """Plain XLA attention. q,k,v: (..., H, S, D); bias broadcastable to
    (..., H, S_q, S_k), already additive (0 / -10000)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    q32 = q.astype(jnp.float32) * scale
    scores = jnp.einsum("...qd,...kd->...qk", q32, k.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: Optional[jnp.ndarray] = None,
                         *, scale: Optional[float] = None,
                         dropout_rate: float = 0.0,
                         dropout_rng=None,
                         deterministic: bool = True) -> jnp.ndarray:
    """Dispatching attention entry point.  Shapes (B, H, S, D)."""
    if (dropout_rate == 0.0 or deterministic) and _use_pallas(q, k, bias):
        from mvlt_tpu.ops import pallas_attn
        out = pallas_attn.flash_attention(q, k, v, bias=bias, scale=scale)
        if out is not None:
            return out
    return reference_attention(q, k, v, bias, scale=scale,
                               dropout_rate=dropout_rate,
                               dropout_rng=dropout_rng,
                               deterministic=deterministic)
