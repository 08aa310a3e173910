"""Pallas flash-attention kernel for TPU (placeholder until the kernel
phase; returns None to signal fallback to the XLA path)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    *, scale: Optional[float] = None):
    return None
