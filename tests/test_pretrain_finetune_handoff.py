"""End-to-end pretrain → export → finetune handoff: the pretrained fusion
weights must actually land in the finetuned model (HF from_pretrained
semantics: matching subtrees loaded, heads freshly initialized)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import (FusionConfig, MVLTConfig, SwinConfig,
                             TrainConfig)
from mvlt_tpu.models.heads import PretrainModel, VQAModel
from mvlt_tpu.tasks.common import TaskRunner
from mvlt_tpu.utils import checkpoint as ckpt_lib

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _cfg(**kw):
    return MVLTConfig(
        conv="swin",
        fusion=FusionConfig(hidden_size=32, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=64,
                            vocab_size=80, max_position_embeddings=64),
        swin=SwinConfig(img_size=32, patch_size=4, embed_dim=8, depths=(1, 1),
                        num_heads=(2, 4), window_size=4, drop_path_rate=0.0),
        cls_token_id=3, sep_token_id=4, eos_token_id=5, mask_token_id=6,
        result_num=3, **kw)


def test_handoff(tmp_path):
    cfg = _cfg(itm_task=True)
    img = jnp.zeros((1, 3, 32, 32), jnp.float32)
    cap = jnp.ones((1, 6), jnp.int32)

    pre = PretrainModel(cfg)
    variables = pre.init(jax.random.PRNGKey(7), img, cap,
                         jnp.full((1, 6), -100, jnp.int32),
                         jnp.zeros((1,), jnp.int32))
    export = str(tmp_path / "export")
    ckpt_lib.save_pretrained(export, cfg, variables)

    cfg2, loaded = ckpt_lib.load_pretrained(export)
    assert cfg2.fusion.hidden_size == 32

    runner = TaskRunner(VQAModel(cfg), cfg, TrainConfig(batch_size=8),
                        name="handoff")
    runner.init_state((img, cap), pretrained_variables=loaded,
                      rng=jax.random.PRNGKey(99))

    got = jax.device_get(runner.state.params)
    want = variables["params"]
    # fusion + backbone transferred exactly
    for path in (("fusion", "layer_0", "intermediate", "kernel"),
                 ("fusion", "word_embeddings", "embedding"),
                 ("conv", "backbone", "patch_embed", "proj", "kernel")):
        a, b = got, want
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the VQA head is NOT in the export → freshly initialized, not zeros
    assert "final_mlp" in got and np.asarray(got["final_mlp"]["kernel"]).std() > 0
