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
        "transform": {
            "transform_dense": _dense(sd, prefix + "predictions.transform.dense"),
            "transform_layernorm": _layernorm(
                sd, prefix + "predictions.transform.LayerNorm"),
        },
        "decoder": decoder,
    }


def head_transform_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """HF ``BertPredictionHeadTransform`` → our params."""
    return {
        "transform_dense": _dense(sd, prefix + "dense"),
        "transform_layernorm": _layernorm(sd, prefix + "LayerNorm"),
    }


# ---------------------------------------------------------------------------
# Swin
# ---------------------------------------------------------------------------

def _patchify_kernel(conv_weight: np.ndarray) -> np.ndarray:
    """Conv (E, C, ph, pw) → patchify-dense kernel (ph*pw*C, E), matching
    PatchEmbed's (ph, pw, c) patch-pixel flattening order."""
    E = conv_weight.shape[0]
    return conv_weight.transpose(2, 3, 1, 0).reshape(-1, E)


def swin_from_torch(sd: Dict[str, np.ndarray], depths, prefix: str = "") -> Dict:
    """Official MSFT ``swin_*_patch4_window7_224.pth`` state dict (fused qkv;
    the file the reference loads at ``modules/model.py:222-226``) → our
    :class:`SwinTransformer` params."""
    params = {
        "patch_embed": {
            "proj": {"kernel": _patchify_kernel(sd[prefix + "patch_embed.proj.weight"]),
                     "bias": sd[prefix + "patch_embed.proj.bias"]},
            "norm": _layernorm(sd, prefix + "patch_embed.norm"),
        },
        "norm": _layernorm(sd, prefix + "norm"),
    }
    if prefix + "absolute_pos_embed" in sd:
        params["absolute_pos_embed"] = sd[prefix + "absolute_pos_embed"]
    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"{prefix}layers.{i}.blocks.{j}."
            params[f"layers_{i}_blocks_{j}"] = {
                "norm1": _layernorm(sd, p + "norm1"),
                "norm2": _layernorm(sd, p + "norm2"),
                "attn": {
                    "qkv": _dense(sd, p + "attn.qkv"),
                    "proj": _dense(sd, p + "attn.proj"),
                    "relative_position_bias_table":
                        sd[p + "attn.relative_position_bias_table"],
                },
                "mlp": {"fc1": _dense(sd, p + "mlp.fc1"),
                        "fc2": _dense(sd, p + "mlp.fc2")},
            }
        dkey = f"{prefix}layers.{i}.downsample.reduction.weight"
        if dkey in sd:
            params[f"layers_{i}_downsample"] = {
                "norm": _layernorm(sd, f"{prefix}layers.{i}.downsample.norm"),
                "reduction": _dense_nobias(sd, f"{prefix}layers.{i}.downsample.reduction"),
            }
    return params


# ---------------------------------------------------------------------------
# Full reference task checkpoints (MVLBertForX state dicts)
# ---------------------------------------------------------------------------

def _conv_layer_from_torch(sd: Dict[str, np.ndarray], conv: str, depths=None,
                           layers=None) -> tuple:
    """Reference ``Conv_layer`` subtree (``conv.conv.0.<backbone>`` +
    ``conv.resnet_fc``, modules/model.py:186-236) → our VisualAdapter."""
    out: Dict = {}
    stats = None
    conv = conv.lower()
    if conv in ("swin", "swintransformer"):
        out["backbone"] = swin_from_torch(sd, depths, prefix="conv.conv.0.")
    elif conv == "linear":
        # linear_patch_16x16: Conv2d 3->768 k16 s16 + BatchNorm2d + ReLU
        # (visual_feature_extractor.py:47-59) -> our LinearPatch proj/bn
        p = "conv.conv.0."
        out["backbone"] = {
            "proj": {"kernel": _conv_kernel(sd[p + "linear_patch.weight"]),
                     "bias": sd[p + "linear_patch.bias"]},
            "bn": {"scale": sd[p + "bn.weight"], "bias": sd[p + "bn.bias"]},
        }
        stats = {"backbone": {"bn": {"mean": sd[p + "bn.running_mean"],
                                     "var": sd[p + "bn.running_var"]}}}
    elif conv in ("resnet101", "resnet50"):
        variables = resnet_from_torchvision(sd, layers, prefix="conv.conv.0.")
        out["backbone"] = variables["params"]
        stats = {"backbone": variables["batch_stats"]}
    else:
        # returning an empty tree would silently leave the backbone at
        # its random init after the pretrained merge
        raise NotImplementedError(f"conv layout {conv!r} not convertible")
    if "conv.resnet_fc.weight" in sd:
        out["resnet_fc"] = _dense(sd, "conv.resnet_fc")
    return out, stats


def _task_common(sd: Dict[str, np.ndarray], num_layers: int, conv: str,
                 depths=None, layers=None) -> Dict:
    conv_params, stats = _conv_layer_from_torch(sd, conv, depths, layers)
    params = {"conv": conv_params,
              "fusion": fusion_from_torch(sd, num_layers, prefix="MVLBert.")}
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = {"conv": stats}
    return variables


def vqa_from_torch(sd, num_layers=12, conv="swin", depths=(2, 2, 18, 2),
                   layers=(3, 4, 23, 3)) -> Dict:
    """Reference ``MVLBertForVQA`` state dict → our VQAModel variables.
    Head: ``final_mlp`` Sequential(Dropout, Linear) → final_mlp.1
    (model.py:313-321)."""
    v = _task_common(sd, num_layers, conv, depths, layers)
    v["params"]["final_mlp"] = _dense(sd, "final_mlp.1")
    return v


def pretrain_from_torch(sd, num_layers=12, conv="swin", depths=(2, 2, 18, 2),
                        layers=(3, 4, 23, 3)) -> Dict:
    """Reference ``MVLBertForPretraining`` (model.py:352-363)."""
    v = _task_common(sd, num_layers, conv, depths, layers)
    v["params"]["mlm_head_seq2seq"] = mlm_head_from_torch(
        sd, "MLM_head_seq2seq.")
    v["params"]["mlm_head_bidir"] = mlm_head_from_torch(sd, "MLM_head_bidir.")
    v["params"]["itm_mlp"] = _dense(sd, "ITM_mlp")
    return v


def retrieval_from_torch(sd, num_layers=12, conv="swin",
                         depths=(2, 2, 18, 2), layers=(3, 4, 23, 3)) -> Dict:
    """Reference ``MVLBertForRetrieval``: final_mlp = Sequential(transform,
    Linear) (model.py:434-440)."""
    v = _task_common(sd, num_layers, conv, depths, layers)
    v["params"]["final_transform"] = head_transform_from_torch(
        sd, "final_mlp.0.")
    v["params"]["final_linear"] = _dense(sd, "final_mlp.1")
    return v


def caption_from_torch(sd, num_layers=12, conv="swin", depths=(2, 2, 18, 2),
                       layers=(3, 4, 23, 3)) -> Dict:
    """Reference ``MVLBertForImageCaption`` (model.py:479-489)."""
    v = _task_common(sd, num_layers, conv, depths, layers)
    v["params"]["mlm_head_seq2seq"] = mlm_head_from_torch(
        sd, "MLM_head_seq2seq.")
    return v


# ---------------------------------------------------------------------------
# ResNet / ViT
# ---------------------------------------------------------------------------

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, kh, kw) → flax (kh, kw, I, O)."""
    return w.transpose(2, 3, 1, 0)


def _convbn(sd, conv_prefix, bn_prefix):
    params = {"conv": {"kernel": _conv_kernel(sd[conv_prefix + ".weight"])},
              "bn": {"scale": sd[bn_prefix + ".weight"],
                     "bias": sd[bn_prefix + ".bias"]}}
    stats = {"bn": {"mean": sd[bn_prefix + ".running_mean"],
                    "var": sd[bn_prefix + ".running_var"]}}
    return params, stats


def resnet_from_torchvision(sd: Dict[str, np.ndarray], layers,
                            prefix: str = "") -> Dict:
    """torchvision ``resnet50/101`` state dict → our ResNet
    {"params": ..., "batch_stats": ...} variable dict (avgpool/fc dropped,
    reference visual_feature_extractor.py:16-23)."""
    params, stats = {}, {}
    params["stem"], stats["stem"] = _convbn(sd, prefix + "conv1", prefix + "bn1")
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            p = f"{prefix}layer{stage + 1}.{b}."
            name = f"layer{stage + 1}_{b}"
            params[name], stats[name] = {}, {}
            for c in (1, 2, 3):
                params[name][f"conv{c}"], stats[name][f"conv{c}"] = _convbn(
                    sd, p + f"conv{c}", p + f"bn{c}")
            if p + "downsample.0.weight" in sd:
                params[name]["downsample"], stats[name]["downsample"] = _convbn(
                    sd, p + "downsample.0", p + "downsample.1")
    return {"params": params, "batch_stats": stats}


def resnet_from_hf(sd: Dict[str, np.ndarray], layers) -> Dict:
    """HF ``transformers.ResNetModel`` state dict → our ResNet variables
    (golden-parity path; torchvision is unavailable in this image)."""
    params, stats = {}, {}
    params["stem"], stats["stem"] = _convbn(
        sd, "embedder.embedder.convolution", "embedder.embedder.normalization")
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            p = f"encoder.stages.{stage}.layers.{b}."
            name = f"layer{stage + 1}_{b}"
            params[name], stats[name] = {}, {}
            for c in (1, 2, 3):
                params[name][f"conv{c}"], stats[name][f"conv{c}"] = _convbn(
                    sd, p + f"layer.{c - 1}.convolution",
                    p + f"layer.{c - 1}.normalization")
            if p + "shortcut.convolution.weight" in sd:
                params[name]["downsample"], stats[name]["downsample"] = _convbn(
                    sd, p + "shortcut.convolution", p + "shortcut.normalization")
    return {"params": params, "batch_stats": stats}


def vit_from_hf(sd: Dict[str, np.ndarray], num_layers: int,
                num_heads: int) -> Dict:
    """HF ``transformers.ViTModel`` state dict → our ViT params.
    Math-identical to the torchvision ViT the reference wraps
    (visual_feature_extractor.py:65-107)."""
    hidden = sd["embeddings.cls_token"].shape[-1]
    dh = hidden // num_heads

    def mha(p):
        def qkv(name):
            w, b = (sd[p + f"attention.attention.{name}.weight"],
                    sd[p + f"attention.attention.{name}.bias"])
            return {"kernel": w.T.reshape(hidden, num_heads, dh),
                    "bias": b.reshape(num_heads, dh)}
        wo = sd[p + "attention.output.dense.weight"]
        return {"query": qkv("query"), "key": qkv("key"), "value": qkv("value"),
                "out": {"kernel": wo.T.reshape(num_heads, dh, hidden),
                        "bias": sd[p + "attention.output.dense.bias"]}}

    params = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embedding": sd["embeddings.position_embeddings"],
        "patch_proj": {
            "kernel": _patchify_kernel(sd["embeddings.patch_embeddings.projection.weight"]),
            "bias": sd["embeddings.patch_embeddings.projection.bias"]},
        "ln": _layernorm(sd, "layernorm"),
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}."
        params[f"block_{i}"] = {
            "ln_1": _layernorm(sd, p + "layernorm_before"),
            "ln_2": _layernorm(sd, p + "layernorm_after"),
            "attention": mha(p),
            "mlp_fc1": _dense(sd, p + "intermediate.dense"),
            "mlp_fc2": _dense(sd, p + "output.dense"),
        }
    return params


def swin_from_hf(sd: Dict[str, np.ndarray], depths) -> Dict:
    """HF ``transformers.SwinModel`` state dict (split q/k/v) → our params.
    Used for golden-value parity tests (timm/torchvision are unavailable)."""
    params = {
        "patch_embed": {
            "proj": {"kernel": _patchify_kernel(
                         sd["embeddings.patch_embeddings.projection.weight"]),
                     "bias": sd["embeddings.patch_embeddings.projection.bias"]},
            "norm": _layernorm(sd, "embeddings.norm"),
        },
        "norm": _layernorm(sd, "layernorm"),
    }
    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"encoder.layers.{i}.blocks.{j}."
            q, k, v = (sd[p + f"attention.self.{n}.weight"] for n in
                       ("query", "key", "value"))
            qb, kb, vb = (sd[p + f"attention.self.{n}.bias"] for n in
                          ("query", "key", "value"))
            params[f"layers_{i}_blocks_{j}"] = {
                "norm1": _layernorm(sd, p + "layernorm_before"),
                "norm2": _layernorm(sd, p + "layernorm_after"),
                "attn": {
                    "qkv": {"kernel": np.concatenate([q.T, k.T, v.T], axis=1),
                            "bias": np.concatenate([qb, kb, vb])},
                    "proj": _dense(sd, p + "attention.output.dense"),
                    "relative_position_bias_table":
                        sd[p + "attention.self.relative_position_bias_table"],
                },
                "mlp": {"fc1": _dense(sd, p + "intermediate.dense"),
                        "fc2": _dense(sd, p + "output.dense")},
            }
        dkey = f"encoder.layers.{i}.downsample.reduction.weight"
        if dkey in sd:
            params[f"layers_{i}_downsample"] = {
                "norm": _layernorm(sd, f"encoder.layers.{i}.downsample.norm"),
                "reduction": _dense_nobias(sd, f"encoder.layers.{i}.downsample.reduction"),
            }
    return params
