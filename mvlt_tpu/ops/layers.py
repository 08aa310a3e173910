"""Shared layer primitives (TPU-first, flax.linen).

Numerics are parity-critical with the PyTorch reference:
- exact (erf) GELU — torch ``nn.GELU()`` default (reference model.py:234,
  visual_feature_extractor.py:126),
- LayerNorm eps 1e-12 in the fusion stack (model.py:25) and 1e-5 in
  torch-default LayerNorms (Swin/ViT),
- init: normal(std=initializer_range) for dense/embedding, LN → 1/0
  (model.py:280-294); trunc_normal(0.02) in Swin
  (visual_feature_extractor.py:659-666).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """erf-based GELU (torch nn.GELU default)."""
    return jax.nn.gelu(x, approximate=False)


def normal_init(std: float = 0.02) -> Callable:
    return nn.initializers.normal(stddev=std)


def trunc_normal_init(std: float = 0.02) -> Callable:
    """timm-style trunc_normal_ (truncated at ±2 std)."""
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class Dense(nn.Module):
    """nn.Dense with BERT-style init and configurable compute dtype."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = normal_init(0.02)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, use_bias=self.use_bias,
                        kernel_init=self.kernel_init,
                        bias_init=nn.initializers.zeros,
                        dtype=self.dtype, name="dense")(x)


class Mlp(nn.Module):
    """2-layer MLP with GELU (reference Mlp, visual_feature_extractor.py:125-141)."""

    hidden_features: int
    out_features: int
    dropout_rate: float = 0.0
    kernel_init: Callable = trunc_normal_init(0.02)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, kernel_init=self.kernel_init,
                     dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, kernel_init=self.kernel_init,
                     dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath used by Swin blocks,
    visual_feature_extractor.py:313)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, p=keep, shape=shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def cross_entropy_ignore_index(logits: jnp.ndarray, labels: jnp.ndarray,
                               ignore_index: int = -100,
                               axis_name=None) -> jnp.ndarray:
    """Mean CE over labels != ignore_index (torch F.cross_entropy parity,
    reference model.py:410, run_vqa.py:105).

    logits: (..., num_classes) float; labels: (...) int.
    Returns a scalar mean over valid positions (0 if none are valid).

    ``axis_name``: inside ``shard_map``, psum both the NLL sum and the
    valid count over the named axis so the mean is over the GLOBAL
    batch's valid positions — bit-matching the single-program (GSPMD)
    formulation even when shards carry different numbers of valid
    labels (MLM masking, -100 unanswerables).
    """
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    total, count = nll.sum(), valid.sum()
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
        count = jax.lax.psum(count, axis_name)
    return total / jnp.maximum(count, 1)


def gather_label_positions(hidden: jnp.ndarray, labels: jnp.ndarray,
                           k: int, ignore_index: int = -100):
    """Select up to ``k`` positions per sample whose label is not
    ``ignore_index`` (stable original order), for sparse-label heads.

    MLM-style losses only read the ~15% masked positions, yet the vocab
    projection (hidden x 30k — as many FLOPs as the whole fusion encoder
    at report lengths) is computed for every position.  Gathering first
    keeps the projection + softmax on a static (B, k) slice.  The data
    pipeline masks at most 10 tokens per sample
    (``data/transforms.py:random_mask_word``, reference
    ``run_pretrain.py:130-158``), so ``k=16`` loses nothing; if a caller
    supplies more than ``k`` valid labels the overflow positions are
    dropped from the loss (mean semantics over the kept ones).

    Returns ``(hidden_g (B, k, H), labels_g (B, k))`` — feed to the head
    and :func:`cross_entropy_ignore_index`; the mean over valid positions
    is unchanged.
    """
    B, L = labels.shape
    k = min(k, L)
    # argsort of the "is padding" flag, stable: valid positions first,
    # each keeping its original order
    order = jnp.argsort((labels == ignore_index).astype(jnp.int32),
                        axis=-1, stable=True)
    idx = order[:, :k]
    labels_g = jnp.take_along_axis(labels, idx, axis=1)
    hidden_g = jnp.take_along_axis(hidden, idx[..., None], axis=1)
    return hidden_g, labels_g
