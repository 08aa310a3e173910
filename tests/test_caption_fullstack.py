"""FULL-STACK caption integration: train -> checkpoint -> restore in a
fresh runner -> beam decode -> PTB tokenize -> BLEU/ROUGE/CIDEr/METEOR,
all through the task driver as ONE path (reference
``run_report_generation_cxr.py:315-379`` trains and evaluates through the
same composition).  Components are each unit-tested elsewhere; this pins
the composition (VERDICT r4 item 4): a tiny caption model overfits ~8
synthetic pairs to near-memorization and every metric comes back finite
and plausible."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import (FusionConfig, MeshConfig, MVLTConfig,
                             TrainConfig)
from mvlt_tpu.data.datasets import CaptionDataset, SyntheticSource
from mvlt_tpu.models.heads import CaptionModel
from mvlt_tpu.tasks.caption import eval_caption, train_caption
from mvlt_tpu.tasks.common import TaskRunner
from mvlt_tpu.text.tokenizer import WordPieceTokenizer, find_default_vocab

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(jax.device_count() < 8,
                                 reason="needs 8 virtual devices")]

CAPTIONS = [
    "the heart size is normal and the lungs are clear",
    "there is a mild pleural effusion on the left side",
]


def _cfg(tok):
    cfg = MVLTConfig(
        conv="linear", is_decoder=True, max_length=16, lr=1e-3,
        fusion=FusionConfig(hidden_size=64, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=128,
                            max_position_embeddings=128,
                            hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0))
    return cfg.with_tokenizer(tok)


def test_caption_train_ckpt_decode_metrics(tmp_path):
    tok = WordPieceTokenizer(find_default_vocab())
    cfg = _cfg(tok)
    # 8 pairs, 2 distinct reports keyed by image: true image-conditioned
    # memorization, not an unconditional language prior
    src = SyntheticSource(n=8, image_size=32, seed=1,
                          captions=[CAPTIONS[i % 2] for i in range(8)])
    train_ds = CaptionDataset(src, tok, max_length=16, split="train",
                              learning_strategy="unilm", seed=0)
    test_ds = CaptionDataset(src, tok, max_length=16, split="test", seed=0)

    epochs = 240                      # 1 step/epoch at batch 8 over n=8
    tc = TrainConfig(batch_size=8, epochs=epochs, seed=0, log_every=10000,
                     checkpoint_every_epochs=epochs, mesh=MeshConfig())
    runner = TaskRunner(CaptionModel(cfg), cfg, tc, workdir=str(tmp_path),
                        name="test-cap-fullstack")
    s = train_ds[0]
    runner.init_state((jnp.asarray(s["image"][None]),
                       jnp.asarray(s["caption"][None])))
    train_caption(runner, train_ds, epochs=epochs,
                  learning_strategy="unilm")

    # fresh runner restores the checkpoint the train loop saved
    runner2 = TaskRunner(CaptionModel(cfg), cfg, tc, workdir=str(tmp_path),
                         name="test-cap-fullstack-restore")
    runner2.init_state((jnp.asarray(s["image"][None]),
                        jnp.asarray(s["caption"][None])))
    assert runner2.maybe_restore(), "train loop must have checkpointed"
    assert int(runner2.state.step) == epochs

    scores = eval_caption(runner2, test_ds, tok, batch_size=8,
                          num_beams=3, strategy="unilm")
    # every metric finite and plausible, incl. the r2gen double-check
    for k, v in scores.items():
        assert np.isfinite(v), (k, scores)
        hi = 10.0 if "CIDEr" in k else 1.0       # CIDEr is 0..10
        assert -1e-6 <= v <= hi + 1e-6, (k, scores)
    assert scores["Bleu_4"] >= 0.95, scores      # near-memorization
    # r2gen respaced double-check agrees on memorized text
    assert scores["r2gen_BLEU_4"] >= 0.95, scores
