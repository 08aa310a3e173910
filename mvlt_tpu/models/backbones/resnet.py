"""Bottleneck ResNet backbone (ResNet-50/101 without avgpool/fc), XLA convs.

TPU-native equivalent of the reference's torchvision backbones
(``modules/visual_feature_extractor.py:7-44``): NHWC layout, fused
conv+BN+relu left to XLA, output is the stage-4 feature map flattened by the
adapter to (B, 49, 2048) tokens.

Architecture is torchvision "v1.5" (stride on the 3x3 conv inside the
bottleneck), which is what ``torchvision.models.resnet101`` builds; weight
layout is convertible 1:1 from torchvision and HF ``ResNetModel``
state dicts (``mvlt_tpu/utils/convert.py``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn

from mvlt_tpu.config import ResNetConfig

Dtype = Any


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch-style symmetric padding (k//2): with strides this differs
        # from XLA SAME (which pads asymmetrically), so make it explicit
        pad = [(k // 2, k // 2) for k in self.kernel]
        x = nn.Conv(self.features, self.kernel, self.strides,
                    padding=pad, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(4x) with projection shortcut on shape change
    (torchvision Bottleneck, expansion=4)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * 4
        shortcut = x
        if x.shape[-1] != out_ch or self.strides != (1, 1):
            shortcut = ConvBN(out_ch, (1, 1), self.strides, dtype=self.dtype,
                              name="downsample")(x, train)
        y = nn.relu(ConvBN(self.features, (1, 1),
                           dtype=self.dtype, name="conv1")(x, train))
        y = nn.relu(ConvBN(self.features, (3, 3), self.strides,
                           dtype=self.dtype, name="conv2")(y, train))
        y = ConvBN(out_ch, (1, 1), dtype=self.dtype, name="conv3")(y, train)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """Stem + 4 bottleneck stages; returns the (B, H/32, W/32, 2048) map as
    (B, N, 2048) tokens (avgpool/fc removed, reference
    visual_feature_extractor.py:16-23, 36-43)."""

    config: ResNetConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        train = not deterministic
        cfg = self.config
        x = nn.relu(ConvBN(cfg.width, (7, 7), (2, 2),
                           dtype=self.dtype, name="stem")(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, blocks in enumerate(cfg.layers):
            features = cfg.width * (2 ** stage)
            for b in range(blocks):
                strides = (2, 2) if (b == 0 and stage > 0) else (1, 1)
                x = Bottleneck(features, strides, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)
