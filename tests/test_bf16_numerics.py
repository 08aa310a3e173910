"""bf16 serving numerics: the bf16-compute model must agree with f32 on
prediction-level outputs (argmax / ranking), the quantities the tasks
consume."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import FusionConfig, MVLTConfig, SwinConfig
from mvlt_tpu.models.heads import RetrievalModel, VQAModel


def _cfg():
    return MVLTConfig(
        conv="swin",
        fusion=FusionConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            vocab_size=64, max_position_embeddings=64),
        swin=SwinConfig(img_size=32, patch_size=4, embed_dim=8, depths=(2, 2),
                        num_heads=(2, 4), window_size=4, drop_path_rate=0.0),
        cls_token_id=3, sep_token_id=4, eos_token_id=5, mask_token_id=6,
        result_num=8)


def test_bf16_vqa_argmax_matches_f32():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(16, 3, 32, 32)), jnp.float32)
    q = jnp.asarray(rng.integers(1, 60, (16, 6)), jnp.int32)

    f32 = VQAModel(cfg, dtype=jnp.float32)
    params = f32.init(jax.random.PRNGKey(0), img, q)
    _, logits32 = f32.apply(params, img, q)
    _, logits16 = VQAModel(cfg, dtype=jnp.bfloat16).apply(params, img, q)

    agree = np.mean(np.argmax(np.asarray(logits32), -1)
                    == np.argmax(np.asarray(logits16), -1))
    assert agree >= 0.9, agree
    # logits close in absolute terms too
    np.testing.assert_allclose(np.asarray(logits16, np.float32),
                               np.asarray(logits32), atol=0.15)


def test_bf16_retrieval_ranking_stable():
    cfg = _cfg()
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32)
    cap = jnp.asarray(rng.integers(1, 60, (8, 6)), jnp.int32)

    f32 = RetrievalModel(cfg, dtype=jnp.float32)
    params = f32.init(jax.random.PRNGKey(0), img, cap)
    s32 = np.asarray(f32.apply(params, img, cap, method=f32.score))
    bf16 = RetrievalModel(cfg, dtype=jnp.bfloat16)
    s16 = np.asarray(bf16.apply(params, img, cap, method=bf16.score),
                     np.float32)
    np.testing.assert_allclose(s16, s32, atol=0.05)
