"""Typed configuration tree for MVLT-TPU.

Replaces the reference's three overlapping config layers (HF ``BertConfig``
subclasses in ``modules/config.py``, the yacs Swin tree in
``modules/swin_transformer_config.py``, and per-script argparse) with one
dataclass tree.  Hyperparameter defaults mirror the reference
(``modules/config.py:4-72``); the Swin variants mirror
``modules/swin_{small,base}_patch4_window7_224.yaml``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """BERT-base fusion encoder config (reference ``modules/model.py:16-33``)."""

    # NOTE: like the reference, the word-embedding table has one extra row
    # beyond ``vocab_size`` (``modules/model.py:21``).  The reference's
    # shipped vocab.txt has ``[END]`` baked in at id 104 (replacing
    # ``[unused99]``), so vocab_size stays 30522; only legacy
    # resnet101-era checkpoints used 30523 (``run_vqa.py:254-255``).
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"  # exact (erf) GELU, matching torch nn.GELU
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0
    max_position_embeddings: int = 512
    type_vocab_size: int = 3
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def embedding_rows(self) -> int:
        # reference quirk: Embedding(vocab_size + 1, hidden)  (model.py:21)
        return self.vocab_size + 1


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """Swin transformer backbone config (reference YAMLs + defaults in
    ``modules/swin_transformer_config.py:16-185``)."""

    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.3
    ape: bool = False
    patch_norm: bool = True

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    @property
    def patches_resolution(self) -> Tuple[int, int]:
        return (self.img_size // self.patch_size, self.img_size // self.patch_size)


def swin_small() -> SwinConfig:
    """Swin-S (reference ``modules/swin_small_patch4_window7_224.yaml``)."""
    return SwinConfig(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
                      drop_path_rate=0.3)


def swin_base() -> SwinConfig:
    """Swin-B (reference ``modules/swin_base_patch4_window7_224.yaml``)."""
    return SwinConfig(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                      drop_path_rate=0.5)


def swin_tiny_test() -> SwinConfig:
    """A tiny Swin for unit tests (not in the reference)."""
    return SwinConfig(img_size=32, patch_size=4, embed_dim=8, depths=(1, 1),
                      num_heads=(2, 4), window_size=4, drop_path_rate=0.0)


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    """Bottleneck ResNet config (torchvision layout; reference
    ``modules/visual_feature_extractor.py:7-44``)."""

    layers: Tuple[int, ...] = (3, 4, 23, 3)  # resnet101
    width: int = 64

    @property
    def out_channels(self) -> int:
        return 512 * 4  # bottleneck expansion


def resnet101() -> ResNetConfig:
    return ResNetConfig(layers=(3, 4, 23, 3))


def resnet50() -> ResNetConfig:
    return ResNetConfig(layers=(3, 4, 6, 3))


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """ViT-B/16 (reference ``modules/visual_feature_extractor.py:65-107``)."""

    image_size: int = 224
    patch_size: int = 16
    num_layers: int = 12
    num_heads: int = 12
    hidden_dim: int = 768
    mlp_dim: int = 3072
    dropout: float = 0.0
    attention_dropout: float = 0.0


@dataclasses.dataclass(frozen=True)
class MVLTConfig:
    """Top-level model config shared by all task heads.

    Mirrors ``MVLBertConfig`` (reference ``modules/config.py:4-27``) plus the
    nested backbone configs the reference resolved via yacs re-parsing.
    """

    fusion: FusionConfig = dataclasses.field(default_factory=FusionConfig)
    # Backbone selection: 'swin' | 'resnet101' | 'resnet50' | 'vit' | 'linear'
    conv: str = "swin"
    swin: SwinConfig = dataclasses.field(default_factory=swin_small)
    resnet: ResNetConfig = dataclasses.field(default_factory=resnet101)
    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig)

    # Task switches / head sizes (config.py:9-15)
    mlm_task: bool = True
    itm_task: bool = True
    result_num: int = 224
    max_length: int = 40
    is_decoder: bool = False
    # MLM-loss position gather: the vocab projection runs only on up to
    # this many label!=-100 positions per sample (the data pipeline masks
    # <=10, so 16 is lossless — ops/layers.py:gather_label_positions).
    # 0 disables (full-sequence logits, reference formulation).
    mlm_gather_k: int = 16

    # Rematerialization (jax.checkpoint) — TPU equivalent of the
    # reference's unused torch.utils.checkpoint knob
    # (swin_transformer_config.py:110, visual_feature_extractor.py:505-510)
    remat_backbone: bool = False
    remat_fusion: bool = False

    # Special token ids, resolved from the tokenizer
    # (``MVLBertConfig.update_special_tokens``, config.py:23-27).
    pad_token_id: int = 0
    eos_token_id: int = 104     # [END] (baked into the reference vocab.txt)
    cls_token_id: int = 101     # [CLS]
    sep_token_id: int = 102     # [SEP]
    mask_token_id: int = 103    # [MASK]

    # Optimizer hyperparams (kept here for parity with the reference, which
    # stores lr on the model config; config.py:14)
    lr: float = 4e-5
    weight_decay: float = 1e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-6
    # First-moment storage dtype. "float32" (the default) keeps bit-level
    # optimizer parity with the reference AdamW. "bfloat16" is an opt-in
    # perf knob: the update is HBM-traffic-bound (~7.6 ms/step at the
    # 206M-param flagship) and bf16 mu cuts ~0.8 GB of that traffic per
    # step with negligible effect on the update direction (mu is a
    # smoothed average; the variance-controlling nu stays f32). Measured
    # end-to-end step delta is recorded in PERF.md.
    adam_mu_dtype: str = "float32"

    def __post_init__(self):
        # Every special token is embedded through the word-embedding table
        # ((vocab_size + 1) rows; the +1 row is the reference's extra MLM
        # row, never a token id).  An out-of-range id silently becomes NaN
        # under jnp.take's fill mode, so fail at construction instead.
        vocab = self.fusion.vocab_size
        for name in ("pad_token_id", "eos_token_id", "cls_token_id",
                     "sep_token_id", "mask_token_id"):
            tid = getattr(self, name)
            if not 0 <= tid < vocab:
                raise ValueError(
                    f"{name}={tid} is outside the word-embedding vocab "
                    f"(vocab_size={vocab}); pass in-vocab special ids "
                    f"(e.g. via with_tokenizer) when shrinking the vocab.")

    def with_tokenizer(self, tokenizer) -> "MVLTConfig":
        """Resolve special token ids + vocab size from a tokenizer
        (parity: ``update_special_tokens``, config.py:23-27)."""
        ids = tokenizer.convert_tokens_to_ids(["[END]", "[CLS]", "[SEP]", "[MASK]"])
        return dataclasses.replace(
            self,
            eos_token_id=ids[0], cls_token_id=ids[1],
            sep_token_id=ids[2], mask_token_id=ids[3],
            fusion=dataclasses.replace(self.fusion, vocab_size=len(tokenizer)),
        )

    # ---- task-variant constructors (config.py:29-72) ----

    @staticmethod
    def for_vqa(**kw) -> "MVLTConfig":
        base = dict(
            fusion=FusionConfig(hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1),
            result_num=224, lr=4e-5)
        base.update(kw)
        return MVLTConfig(**base)

    @staticmethod
    def for_pretrain(**kw) -> "MVLTConfig":
        base = dict(
            fusion=FusionConfig(hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1),
            itm_task=False, max_length=150, lr=4e-5)
        base.update(kw)
        return MVLTConfig(**base)

    @staticmethod
    def for_retrieval(**kw) -> "MVLTConfig":
        base = dict(
            fusion=FusionConfig(attention_probs_dropout_prob=0.1),
            itm_task=True, max_length=80, lr=1e-6)
        base.update(kw)
        return MVLTConfig(**base)

    @staticmethod
    def for_caption(**kw) -> "MVLTConfig":
        base = dict(
            fusion=FusionConfig(hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1),
            max_length=80, lr=1e-5, is_decoder=True)
        base.update(kw)
        return MVLTConfig(**base)

    # ---- (de)serialization ----

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "MVLTConfig":
        raw = json.loads(text)

        def _mk(cls, d):
            if d is None:
                return cls()
            fields = {f.name for f in dataclasses.fields(cls)}
            clean = {}
            for k, v in d.items():
                if k not in fields:
                    continue
                clean[k] = tuple(v) if isinstance(v, list) else v
            return cls(**clean)

        kw = dict(raw)
        kw["fusion"] = _mk(FusionConfig, raw.get("fusion"))
        kw["swin"] = _mk(SwinConfig, raw.get("swin"))
        kw["resnet"] = _mk(ResNetConfig, raw.get("resnet"))
        kw["vit"] = _mk(ViTConfig, raw.get("vit"))
        fields = {f.name for f in dataclasses.fields(MVLTConfig)}
        kw = {k: v for k, v in kw.items() if k in fields}
        return MVLTConfig(**kw)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for SPMD execution (no reference equivalent —
    the reference is single-device; see SURVEY.md §2.3)."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1   # -1: all remaining devices
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop knobs (reference hardcodes these in run_*.py)."""

    batch_size: int = 32
    epochs: int = 100
    seed: int = 0
    # PRNG implementation for the training rng (dropout/DropPath masks and
    # the seq2seq coin flip).  'rbg' uses the TPU hardware generator —
    # measured 1.54 vs 3.32 ms per flagship pretrain step (b32) for the
    # per-layer mask bill vs the JAX-default 'threefry2x32', which stays
    # available for backend-invariant reproducibility.  Dropout masks need
    # no cryptographic quality; results remain deterministic per seed on a
    # given backend either way.
    rng_impl: str = "rbg"
    bf16_compute: bool = True
    remat_backbone: bool = False
    remat_fusion: bool = False
    grad_accum_steps: int = 1
    # Host-loader worker processes (reference torch DataLoader
    # num_workers=8, run_pretrain.py:255).  PIL decode/resize holds the
    # GIL, so real-image feeding needs processes; -1 = auto-size to the
    # host (min(8, cores-1), threaded fallback on <=2-core hosts where
    # worker IPC costs more than it buys); 0 forces the threaded path.
    # Measured end-to-end in PERF.md.
    num_workers: int = -1
    log_every: int = 50
    checkpoint_every_epochs: int = 1
    # overlap Orbax persistence with training: save() returns after the
    # device->host snapshot; serialization runs on a background thread
    # (utils/checkpoint.py).  The reference's torch.save blocks the loop.
    async_checkpoint: bool = True
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def tiny_config(cfg: "MVLTConfig") -> "MVLTConfig":
    """Shrink a task config for smoke runs, PRESERVING its semantics —
    dropouts, task switches and special tokens are kept (only sizes
    change), so tiny runs exercise the same code paths (masked fused
    kernels, dropout rng plumbing) as full runs."""
    return dataclasses.replace(
        cfg,
        fusion=dataclasses.replace(
            cfg.fusion, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128),
        swin=SwinConfig(img_size=32, patch_size=4, embed_dim=16,
                        depths=(1, 1), num_heads=(2, 4), window_size=4,
                        drop_path_rate=0.0))
