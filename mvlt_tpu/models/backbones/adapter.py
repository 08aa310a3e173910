"""Backbone adapter (the reference's ``Conv_layer``, ``modules/model.py:186-266``).

Responsibilities, matching the reference exactly:
- select the visual backbone by ``config.conv``;
- handle the 5-D two-view IU X-Ray input (B, 2, C, H, W): encode each view
  and concatenate along the token axis (model.py:240-253);
- flatten (B, C, H, W) feature maps to (B, H*W, C) token sequences
  (model.py:259-261);
- apply a trailing GELU (model.py:232-235);
- project 2048-channel ResNet features to hidden size (model.py:236, 263-264).

TPU-first notes: images arrive NCHW from the data pipeline (parity with the
reference's tensors) and are transposed once to NHWC, the layout XLA:TPU
convolutions want.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mvlt_tpu.config import MVLTConfig
from mvlt_tpu.ops.layers import gelu_exact, normal_init


def device_var_normalize(img_u8: jnp.ndarray) -> jnp.ndarray:
    """Device-side equivalent of the reference's host preprocessing
    (``run_pretrain_rgc_roco_medicat.py:104-110``): uint8 (..., H, W, 3)
    -> float32 (..., 3, H, W), per-image per-channel ``(x - mean) / var``
    (the reference's variance-not-std quirk, same f32 math as
    :func:`mvlt_tpu.data.transforms.normalize_image_var` — only the
    reduction runs on the TPU instead of the host CPU).  Moving this off
    the host roughly doubles a loader core's throughput and cuts
    host->HBM bytes 4x."""
    x = img_u8.astype(jnp.float32)
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.var(x, axis=(-3, -2), keepdims=True)
    x = (x - mean) / var
    return jnp.moveaxis(x, -1, -3)


class VisualAdapter(nn.Module):
    config: MVLTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        conv = cfg.conv.lower()
        if conv == "linear":
            from mvlt_tpu.models.backbones.linear_patch import LinearPatch
            self.backbone = LinearPatch(features=cfg.fusion.hidden_size,
                                        dtype=self.dtype, name="backbone")
            self._needs_proj = False
        elif conv in ("swin", "swintransformer"):
            from mvlt_tpu.models.backbones.swin import SwinTransformer
            self.backbone = SwinTransformer(cfg.swin, dtype=self.dtype,
                                            remat=cfg.remat_backbone,
                                            name="backbone")
            self._needs_proj = cfg.swin.num_features != cfg.fusion.hidden_size
        elif conv in ("resnet101", "resnet50"):
            from mvlt_tpu.models.backbones.resnet import ResNet
            self.backbone = ResNet(cfg.resnet, dtype=self.dtype, name="backbone")
            self._needs_proj = True
        elif conv in ("vit", "visiontransformer"):
            from mvlt_tpu.models.backbones.vit import ViT
            self.backbone = ViT(cfg.vit, dtype=self.dtype, name="backbone")
            self._needs_proj = cfg.vit.hidden_dim != cfg.fusion.hidden_size
        else:
            raise NotImplementedError(f"no such config.conv: {cfg.conv}")
        if self._needs_proj:
            # reference resnet_fc (model.py:236); created unconditionally
            # there, but we only create it when the backbone needs it.
            self.resnet_fc = nn.Dense(cfg.fusion.hidden_size,
                                      kernel_init=normal_init(0.02),
                                      dtype=self.dtype, name="resnet_fc")

    def _encode_one(self, img_nchw, deterministic):
        x = jnp.transpose(img_nchw, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        tokens = self.backbone(x, deterministic=deterministic)  # (B, N, C)
        tokens = gelu_exact(tokens)  # Sequential(conv, GELU), model.py:232-235
        if self._needs_proj:
            tokens = self.resnet_fc(tokens)
        return tokens

    def __call__(self, image, deterministic: bool = True):
        """image: (B, C, H, W) or two-view (B, 2, C, H, W) -> (B, N, hidden).

        uint8 inputs are RAW (..., H, W, 3) frames from the
        device-normalize host path; the float cast + variance
        normalization + CHW layout happen here, inside the jitted model
        (:func:`device_var_normalize`)."""
        if image.dtype == jnp.uint8:
            image = device_var_normalize(image)
        if image.ndim == 5:
            t1 = self._encode_one(image[:, 0], deterministic)
            t2 = self._encode_one(image[:, 1], deterministic)
            return jnp.concatenate([t1, t2], axis=1)
        return self._encode_one(image, deterministic)
