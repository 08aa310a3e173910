"""Import the ACTUAL reference implementation (/root/reference/modules)
as an executable oracle for full-model parity tests.

The reference imports torchvision, timm and yacs, none of which are
installed here; this module installs minimal stand-ins BEFORE importing
the reference package:

- ``torchvision``: class placeholders only — the reference subclasses
  ``torchvision.models.ResNet`` / ``VisionTransformer`` at import time but
  parity tests never instantiate those backbones (instantiating raises).
- ``timm.models.layers``: faithful ``DropPath`` (per-sample stochastic
  depth, identity in eval), ``to_2tuple``, ``trunc_normal_`` — enough to
  run the vendored Swin code for real.
- ``yacs.config.CfgNode``: dict with attribute access + the exact subset
  the reference's ``swin_transformer_config.py`` touches (clone,
  defrost/freeze, merge_from_file, merge_from_list).
- ``transformers.BeamSearchScorer``: re-exported from
  ``transformers.generation.beam_search`` (removed from the top-level
  namespace in transformers >= 4.57).

The reference model/config/generation code itself runs unmodified.
"""

from __future__ import annotations

import copy
import functools
import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _module(name: str) -> types.ModuleType:
    """Stub module with a real ModuleSpec (transformers probes
    availability via importlib.util.find_spec, which requires
    ``__spec__`` to be set)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    import torch.nn as nn

    class _Unavailable(nn.Module):
        def __init__(self, *a, **k):  # subclassable; not instantiable
            raise ImportError(
                "torchvision backbones are unavailable in this environment")

    tv = _module("torchvision")
    models = _module("torchvision.models")
    resnet = _module("torchvision.models.resnet")
    vit = _module("torchvision.models.vision_transformer")
    models.ResNet = _Unavailable
    models.VisionTransformer = _Unavailable
    resnet.Bottleneck = object
    resnet.model_urls = {}
    vit.model_urls = {}
    models.resnet = resnet
    models.vision_transformer = vit
    tv.models = models
    for name, mod in (("torchvision", tv), ("torchvision.models", models),
                      ("torchvision.models.resnet", resnet),
                      ("torchvision.models.vision_transformer", vit)):
        sys.modules[name] = mod


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        """timm-faithful stochastic depth (identity in eval mode)."""

        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if not self.drop_prob or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rand = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * rand.floor_()

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    timm = _module("timm")
    tmodels = _module("timm.models")
    tlayers = _module("timm.models.layers")
    tlayers.DropPath = DropPath
    tlayers.to_2tuple = to_2tuple
    tlayers.trunc_normal_ = nn.init.trunc_normal_
    tmodels.layers = tlayers
    timm.models = tmodels
    for name, mod in (("timm", timm), ("timm.models", tmodels),
                      ("timm.models.layers", tlayers)):
        sys.modules[name] = mod


class _CfgNode(dict):
    """Minimal yacs.config.CfgNode: attribute-style nested dict."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def clone(self):
        return copy.deepcopy(self)

    def defrost(self):
        return self

    def freeze(self):
        return self

    def _merge_dict(self, other):
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), dict):
                _CfgNode._merge_dict(self[k], v)
            else:
                self[k] = tuple(v) if isinstance(v, list) else v

    def merge_from_file(self, path):
        import yaml
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        data.pop("BASE", None)
        self._merge_dict(data)

    def merge_from_list(self, opts):
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            old = node.get(parts[-1])
            if old is not None and not isinstance(old, (list, tuple, dict)):
                value = type(old)(value)
            node[parts[-1]] = value


def _install_yacs_stub():
    if "yacs" in sys.modules:
        return
    yacs = _module("yacs")
    config = _module("yacs.config")
    config.CfgNode = _CfgNode
    yacs.config = config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = config


def _patch_transformers():
    # Importing deep submodules swaps the lazy `transformers` module
    # object in sys.modules — force the swap FIRST, then patch the final
    # object (an attribute set on the pre-swap object is lost).
    import transformers.models.bert.modeling_bert  # noqa: F401
    from transformers.generation.beam_search import BeamSearchScorer
    tr = sys.modules["transformers"]
    if not hasattr(tr, "BeamSearchScorer"):
        tr.BeamSearchScorer = BeamSearchScorer


def shim_legacy_cache(ref_model):
    """API-compat shim for transformers >= 4.54: the reference's
    generation loops iterate ``outputs.past_key_values`` as a legacy
    tuple of per-layer (key, value) pairs (model.py:758-763, 890-894),
    but modern BertEncoder returns an ``EncoderDecoderCache`` whose
    legacy export includes (empty) cross-attention entries and raises.
    Wrap the instance's MVLBert.forward to convert the returned cache to
    the self-attention legacy tuples the reference was written against —
    the tensors are identical, only the container changes."""
    mvl = ref_model.MVLBert
    orig_forward = mvl.forward

    def patched_forward(*args, **kwargs):
        out = orig_forward(*args, **kwargs)
        encoder_output = out[0] if isinstance(out, tuple) else out
        pk = getattr(encoder_output, "past_key_values", None)
        if pk is not None and not isinstance(pk, tuple):
            sa = getattr(pk, "self_attention_cache", pk)
            encoder_output.past_key_values = tuple(
                (layer.keys, layer.values) for layer in sa.layers)
        return out

    mvl.forward = patched_forward
    return ref_model


@functools.lru_cache(maxsize=1)
def load_reference():
    """Import and return the reference ``modules`` package
    (``modules.model``, ``modules.config``).  Cached; safe to call from
    every test."""
    _install_torchvision_stub()
    _install_timm_stub()
    _install_yacs_stub()
    _patch_transformers()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import modules.config  # noqa: F401
    import modules.model
    return modules.model
