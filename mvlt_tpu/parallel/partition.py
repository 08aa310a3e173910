"""Parameter / batch partition rules (GSPMD shardings for pjit).

Megatron-style tensor parallelism over the ``model`` axis for the matmul-
heavy fusion encoder and MLM/vocab heads; everything else (backbone, small
heads, norms, embeddings' hidden dim) replicated.  XLA inserts the
all-reduce / all-gather collectives — there is no hand-written comm layer
(SURVEY.md §2.3, §5 "Distributed communication backend").

Rules are matched on the flattened param path (joined with '/'):

- attention query/key/value kernels (H, H)        → shard columns  (None, model)
- attention out-projection kernel (H, H)          → shard rows     (model, None)
- FFN up kernel (H, 4H) / fused qkv (H, 3H)       → shard columns
- FFN down kernel (4H, H)                          → shard rows
- MLM decoder kernel (H, V) and bias (V,)          → shard vocab
- word embedding table (V+1, H)                    → shard vocab rows
- everything else                                  → replicated
"""

from __future__ import annotations

import re
from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over 'path/to/param', spec) — first match wins.
_RULES: Tuple[Tuple[str, P], ...] = (
    # fusion encoder attention (models/fusion.py SelfAttention)
    (r"attention/(query|key|value)/kernel$", P(None, "model")),
    (r"attention/(query|key|value)/bias$", P("model")),
    (r"attention/out/kernel$", P("model", None)),
    # fusion FFN
    (r"intermediate/kernel$", P(None, "model")),
    (r"intermediate/bias$", P("model")),
    (r"/output/kernel$", P("model", None)),
    # swin / vit blocks
    (r"attn/qkv/kernel$", P(None, "model")),
    (r"attn/qkv/bias$", P("model")),
    (r"attn/proj/kernel$", P("model", None)),
    (r"mlp/fc1/kernel$", P(None, "model")),
    (r"mlp/fc1/bias$", P("model")),
    (r"mlp/fc2/kernel$", P("model", None)),
    (r"mlp_fc1/kernel$", P(None, "model")),
    (r"mlp_fc1/bias$", P("model")),
    (r"mlp_fc2/kernel$", P("model", None)),
    # vocab-dim sharding: MLM decoder + embedding table
    (r"mlm_head_\w+/decoder/kernel$", P(None, "model")),
    (r"mlm_head_\w+/decoder/bias$", P("model")),
    (r"word_embeddings/embedding$", P("model", None)),
)


def partition_spec_for_path(path: str, ndim: int, shape=None,
                            model_size: int = 1) -> P:
    """Spec for one param. Falls back to replicated when the sharded dim is
    not divisible by the model-axis size (static check keeps XLA from
    padding)."""
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            if shape is not None and model_size > 1:
                ok = True
                for dim, axis in zip(shape, tuple(spec) + (None,) * ndim):
                    if axis == "model" and dim % model_size != 0:
                        ok = False
                if not ok:
                    return P()
            if len(spec) > ndim:
                return P()
            return spec
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Map a param pytree to NamedShardings under ``mesh``."""
    model_size = mesh.shape.get("model", 1)

    def _one(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = partition_spec_for_path(name, leaf.ndim, leaf.shape, model_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(_one, params)


def batch_sharding(mesh: Mesh, *, axis: str = "data") -> NamedSharding:
    """Leading-axis data sharding for input batches."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
