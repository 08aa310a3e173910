"""MVLT-TPU: a TPU-native medical vision-language transformer framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
PyTorch reference ``Control-xl/Medical-Vision-Langauge-Transformer``:

- one single-stream multimodal fusion encoder (BERT-base over
  ``[CLS] <image tokens> [SEP] <text tokens>``) with pluggable visual
  backbones (Swin-S/B, ResNet-50/101, ViT-B/16, linear patch),
- four task heads: MLM+ITM pretraining, VQA classification, image-text
  retrieval, and autoregressive report generation with KV-cached
  greedy / sampling / beam decoding,
- per-task dataset pipelines, captioning metrics (BLEU/ROUGE-L/CIDEr/
  METEOR + PTB tokenization, no Java), and
- first-class SPMD parallelism over a ``jax.sharding.Mesh`` (data and
  tensor axes) that the reference never had.

Everything under ``mvlt_tpu`` is functional JAX: static shapes, ``lax``
control flow, explicit PRNG keys, bf16 compute with f32 params.
"""

__version__ = "0.1.0"
