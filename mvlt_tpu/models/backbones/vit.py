"""ViT-B/16 backbone returning all patch tokens (class token dropped), the
TPU-native equivalent of the reference's
``VisionTransformerBaseWithoutPooling`` (``modules/visual_feature_extractor.py:65-107``).

Pre-LN transformer identical in math to torchvision/HF ViT: patchify (as
reshape + dense, MXU-native), prepend class token, add learned position
embeddings, N encoder blocks (LN -> MHA -> residual, LN -> MLP(GELU) ->
residual), final LN, then drop the class token (reference :107 ``x[:, 1:]``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from mvlt_tpu.config import ViTConfig
from mvlt_tpu.ops.layers import gelu_exact, normal_init

Dtype = Any


class ViTBlock(nn.Module):
    hidden_dim: int
    num_heads: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.attention_dropout,
            deterministic=deterministic, dtype=self.dtype,
            name="attention")(h, h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_fc1")(y)
        y = gelu_exact(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp_fc2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return x + y


class ViT(nn.Module):
    config: ViTConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        B, H, W, C = x.shape
        p = cfg.patch_size
        n = (H // p) * (W // p)
        x = x.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, n, p * p * C)
        x = nn.Dense(cfg.hidden_dim, kernel_init=normal_init(0.02),
                     dtype=self.dtype, name="patch_proj")(x)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_dim))
        pos = self.param("pos_embedding", normal_init(0.02),
                         (1, n + 1, cfg.hidden_dim))
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (B, 1, 1)), x], 1)
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        for i in range(cfg.num_layers):
            x = ViTBlock(cfg.hidden_dim, cfg.num_heads, cfg.mlp_dim,
                         cfg.dropout, cfg.attention_dropout,
                         dtype=self.dtype, name=f"block_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(x)
        return x[:, 1:]  # drop class token (reference :107)
