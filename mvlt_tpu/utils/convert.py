"""PyTorch-checkpoint → MVLT-TPU parameter converters.

Maps HF/torchvision/timm state_dict names onto our flax param trees so the
bit-compat targets (BASELINE.md) can be checked against reference weights:

- HF ``BertEncoder`` / MVLBert fusion weights → :class:`FusionEncoder`
- MSFT Swin ``.pth`` (reference ``modules/model.py:222-226``) → our Swin
- torchvision ResNet-50/101 → our ResNet

All converters take a ``dict[str, np.ndarray]`` (use :func:`state_dict_to_numpy`
on a torch state_dict) and return nested flax param dicts.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _dense(sd, prefix):
    return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}


def _dense_nobias(sd, prefix):
    return {"kernel": sd[prefix + ".weight"].T}


def _layernorm(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def bert_encoder_from_torch(sd: Dict[str, np.ndarray], num_layers: int,
                            prefix: str = "") -> Dict:
    """HF ``BertEncoder`` state dict → our ``layer_{i}`` param subtrees."""
    params = {}
    for i in range(num_layers):
        p = f"{prefix}layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": _dense(sd, p + "attention.self.query"),
                "key": _dense(sd, p + "attention.self.key"),
                "value": _dense(sd, p + "attention.self.value"),
                "out": _dense(sd, p + "attention.output.dense"),
                "out_layernorm": _layernorm(sd, p + "attention.output.LayerNorm"),
            },
            "intermediate": _dense(sd, p + "intermediate.dense"),
            "output": _dense(sd, p + "output.dense"),
            "output_layernorm": _layernorm(sd, p + "output.LayerNorm"),
        }
    return params


def fusion_from_torch(sd: Dict[str, np.ndarray], num_layers: int,
                      prefix: str = "MVLBert.") -> Dict:
    """Reference ``MVLBert`` module state dict → FusionEncoder params.

    Torch names (reference model.py:16-33): ``word_embeddings.weight``,
    ``position_embeddings.weight``, ``token_type_embeddings.weight``,
    ``encoder.layer.{i}.*`` (HF BertEncoder), ``pooler.dense.*``.
    """
    params = {
        "word_embeddings": {"embedding": sd[prefix + "word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd[prefix + "position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": sd[prefix + "token_type_embeddings.weight"]},
    }
    params.update(bert_encoder_from_torch(sd, num_layers, prefix + "encoder."))
    if prefix + "pooler.dense.weight" in sd:
        params["pooler"] = {"dense": _dense(sd, prefix + "pooler.dense")}
    return params


def mlm_head_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """HF ``BertOnlyMLMHead`` → our MLMHead params.

    Torch names: ``{prefix}predictions.transform.dense.*``,
    ``{prefix}predictions.transform.LayerNorm.*``,
    ``{prefix}predictions.decoder.weight`` + ``predictions.bias``.
    """
    decoder = {"kernel": sd[prefix + "predictions.decoder.weight"].T}
    bias_key = prefix + "predictions.decoder.bias"
    if bias_key not in sd:
        bias_key = prefix + "predictions.bias"
    decoder["bias"] = sd[bias_key]
    return {
        "transform_dense": _dense(sd, prefix + "predictions.transform.dense"),
        "transform_layernorm": _layernorm(sd, prefix + "predictions.transform.LayerNorm"),
        "decoder": decoder,
    }


def head_transform_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """HF ``BertPredictionHeadTransform`` → our params."""
    return {
        "transform_dense": _dense(sd, prefix + "dense"),
        "transform_layernorm": _layernorm(sd, prefix + "LayerNorm"),
    }
