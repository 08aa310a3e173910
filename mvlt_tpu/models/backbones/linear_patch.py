"""Linear-patch backbone: Conv 3->768 k16 s16 + BatchNorm + ReLU
(reference ``modules/visual_feature_extractor.py:47-59``).

Input is NCHW (B, 3, 224, 224) like the reference data pipeline; output is
a (B, 768, 14, 14) feature map expressed as NHWC internally and returned as
(B, 196, 768) token sequence by the adapter.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class LinearPatch(nn.Module):
    features: int = 768
    patch: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_nhwc, deterministic: bool = True):
        x = nn.Conv(self.features, kernel_size=(self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="proj")(x_nhwc)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)
