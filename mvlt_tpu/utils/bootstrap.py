"""Official-backbone checkpoint bootstrap.

The reference auto-loads pretrained backbone weights at model build —
``./modules/swin_small_patch4_window7_224.pth`` for Swin
(``modules/model.py:222-226``) and torchvision URL weights for
ResNet/ViT (``visual_feature_extractor.py:10-12, 31, 87``).  The TPU
framework makes this an explicit driver flag (``--backbone_ckpt``):
:func:`load_backbone` reads a checkpoint file, detects its layout, and
returns a partial variables tree that merges into a freshly initialized
model (missing keys stay initialized, HF ``from_pretrained`` semantics —
``tasks/common._merge_pretrained``).

Supported layouts (auto-detected from the state-dict keys):
- official MSFT Swin ``.pth`` (``{'model': sd}`` wrapper or bare sd,
  fused-qkv ``layers.{i}.blocks.{j}.*`` keys)
- HF ``SwinModel`` exports (``swin.``/``encoder.layers`` keys,
  separate q/k/v)
- torchvision ResNet (``layer{1..4}.{b}.conv{c}`` keys)
- HF ``ResNetModel`` exports (``embedder.``/``encoder.stages`` keys)
- HF ``ViTModel`` exports (``embeddings.cls_token`` etc.)
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from mvlt_tpu.config import MVLTConfig
from mvlt_tpu.utils import convert


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith((".npz", ".npy")):
        data = np.load(path, allow_pickle=True)
        sd = {k: data[k] for k in data.files} if hasattr(data, "files") \
            else dict(data.item())
    else:
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "model" in obj \
                and isinstance(obj["model"], dict):
            obj = obj["model"]          # official Swin .pth wrapper
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        sd = obj
    return convert.state_dict_to_numpy(sd)


def _strip_prefix(sd: Dict[str, np.ndarray], prefix: str
                  ) -> Dict[str, np.ndarray]:
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}
    return sd


def convert_backbone(sd: Dict[str, np.ndarray], conv: str,
                     cfg: MVLTConfig) -> Dict[str, Any]:
    """State dict (layout auto-detected) → partial variables tree
    ``{"params": {"conv": {"backbone": ...}}[, "batch_stats": ...]}``."""
    conv = conv.lower()
    stats = None
    if conv in ("swin", "swintransformer"):
        sd = _strip_prefix(sd, "swin.")
        if any(".attn.qkv.weight" in k for k in sd):          # MSFT fused
            params = convert.swin_from_torch(sd, cfg.swin.depths)
        else:                                                  # HF layout
            params = convert.swin_from_hf(sd, cfg.swin.depths)
    elif conv in ("resnet101", "resnet50"):
        sd = _strip_prefix(sd, "resnet.")
        if any(k.startswith("layer1.") for k in sd):           # torchvision
            variables = convert.resnet_from_torchvision(sd, cfg.resnet.layers)
        else:                                                  # HF layout
            variables = convert.resnet_from_hf(sd, cfg.resnet.layers)
        params, stats = variables["params"], variables["batch_stats"]
    elif conv in ("vit", "visiontransformer"):
        sd = _strip_prefix(sd, "vit.")
        params = convert.vit_from_hf(sd, cfg.vit.num_layers,
                                     cfg.vit.num_heads)
    else:
        raise NotImplementedError(
            f"--backbone_ckpt does not apply to conv={conv!r}")

    out: Dict[str, Any] = {"params": {"conv": {"backbone": params}}}
    if stats is not None:
        out["batch_stats"] = {"conv": {"backbone": stats}}
    return out


def load_backbone(path: str, cfg: MVLTConfig) -> Dict[str, Any]:
    """Read + convert an official backbone checkpoint for ``cfg.conv``."""
    return convert_backbone(_load_state_dict(path), cfg.conv, cfg)
