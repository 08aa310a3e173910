"""Task orchestration layer: VQA train/eval, retrieval grid scoring,
caption eval — tiny synthetic runs on the virtual mesh."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import (FusionConfig, MeshConfig, MVLTConfig, SwinConfig,
                             TrainConfig)
from mvlt_tpu.data.datasets import (MedVQADataset, RetrievalDataset,
                                    SyntheticSource)
from mvlt_tpu.models.heads import RetrievalModel, VQAModel
from mvlt_tpu.tasks.common import TaskRunner
from mvlt_tpu.tasks.retrieval import eval_retrieval
from mvlt_tpu.tasks.vqa import eval_vqa, train_vqa
from mvlt_tpu.text.tokenizer import WordPieceTokenizer

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")

from mvlt_tpu.text.tokenizer import find_default_vocab

VOCAB = find_default_vocab()  # packaged mvlt_tpu/text/vocab.txt


def tiny_cfg(**kw):
    return MVLTConfig(
        conv="linear",
        fusion=FusionConfig(hidden_size=32, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=64,
                            vocab_size=30523, max_position_embeddings=256),
        result_num=2, lr=5e-4, **kw)


def _vqa_data(n=32, tok=None):
    rng = np.random.default_rng(0)
    images = rng.normal(size=(4, 3, 32, 32)).astype(np.float32)
    # learnable rule: label depends on question text
    entries = [{"img_id": i % 4,
                "question": ("is it normal" if i % 2 == 0 else
                             "is it abnormal"),
                "label": i % 2,
                "answer_type": "CLOSED" if i % 2 else "OPEN"}
               for i in range(n)]
    ds = MedVQADataset.from_arrays(images, entries, {"yes": 0, "no": 1},
                                   max_len=8)
    ds.tokenize(tok)
    return ds


def test_vqa_train_learns_and_checkpoints(tmp_path):
    tok = WordPieceTokenizer(VOCAB)
    cfg = tiny_cfg().with_tokenizer(tok)
    cfg = dataclasses.replace(
        cfg, fusion=dataclasses.replace(cfg.fusion, vocab_size=30523))
    train_ds = _vqa_data(32, tok)
    test_ds = _vqa_data(16, tok)

    tc = TrainConfig(batch_size=8, epochs=6, seed=0, log_every=1000,
                     mesh=MeshConfig())
    runner = TaskRunner(VQAModel(cfg), cfg, tc, workdir=str(tmp_path),
                        name="test-vqa")
    s = train_ds[0]
    runner.init_state((jnp.asarray(s["image"][None]),
                       jnp.asarray(s["question"][None])))
    before = eval_vqa(runner, test_ds, batch_size=8)
    best = train_vqa(runner, train_ds, valid_ds=test_ds, test_ds=test_ds,
                     epochs=6)
    assert best["test"]["overall"] > max(0.55, before["overall"] - 0.01)
    assert any(d.startswith("step_") for d in os.listdir(tmp_path))
    # answer_type split present
    assert "open" in best["test"] and "closed" in best["test"]


def test_retrieval_grid_eval(tmp_path):
    tok = WordPieceTokenizer(VOCAB)
    cfg = tiny_cfg().with_tokenizer(tok)
    src = SyntheticSource(n=4)
    test_ds = RetrievalDataset(src, tok, max_length=12, split="test")
    tc = TrainConfig(batch_size=8, mesh=MeshConfig())
    runner = TaskRunner(RetrievalModel(cfg), cfg, tc, name="test-ret")
    s = test_ds[0]
    runner.init_state((jnp.asarray(s["image"][None]),
                       jnp.asarray(s["caption"][None])))
    out = eval_retrieval(runner, test_ds, batch_size=8)
    for d in ("i2t_retrieval", "t2i_retrieval"):
        assert set(out[d]) == {"R@1", "R@5", "R@10"}
        assert out[d]["R@10"] == 1.0  # N=4 < 10 → everything within top-10


def test_eval_vqa_writes_predictions(tmp_path):
    tok = WordPieceTokenizer(VOCAB)
    cfg = tiny_cfg().with_tokenizer(tok)
    ds = _vqa_data(8, tok)
    runner = TaskRunner(VQAModel(cfg), cfg, TrainConfig(batch_size=8),
                        name="test-vqa-pred")
    s = ds[0]
    runner.init_state((jnp.asarray(s["image"][None]),
                       jnp.asarray(s["question"][None])))
    path = str(tmp_path / "preds.json")
    acc = eval_vqa(runner, ds, batch_size=8, predictions_path=path)
    assert os.path.exists(path)
    import json
    preds = json.load(open(path))
    assert len(preds) == 8 and {"pred", "label", "answer_type"} <= set(preds[0])


def test_eval_reuses_compiled_fn():
    """Per-epoch validation must hit the jit cache, not re-trace: the
    runner caches compiled eval fns by semantic key (regression for
    closures defined inside eval that re-compiled every epoch)."""
    tok = WordPieceTokenizer(VOCAB)
    cfg = tiny_cfg().with_tokenizer(tok)
    ds = _vqa_data(8, tok)
    runner = TaskRunner(VQAModel(cfg), cfg, TrainConfig(batch_size=8),
                        name="test-vqa-cache")
    s = ds[0]
    runner.init_state((jnp.asarray(s["image"][None]),
                       jnp.asarray(s["question"][None])))
    eval_vqa(runner, ds, batch_size=8)
    fn1 = runner._compiled["vqa_eval_fwd"]
    assert fn1._cache_size() == 1
    eval_vqa(runner, ds, batch_size=8)
    fn2 = runner._compiled["vqa_eval_fwd"]
    assert fn2 is fn1                      # same jitted callable
    assert fn2._cache_size() == 1          # no re-trace on the 2nd eval


@pytest.mark.quick
def test_train_rng_impls():
    """train_rng honors TrainConfig.rng_impl: the default 'rbg' produces a
    typed key that flows through fold_in/bernoulli (the dropout path), and
    'threefry2x32' falls back to the raw uint32 PRNGKey."""
    from mvlt_tpu.tasks.common import train_rng

    tc = TrainConfig()                       # default: rbg
    k = train_rng(tc)
    assert jnp.issubdtype(k.dtype, jax.dtypes.prng_key)
    m = jax.random.bernoulli(jax.random.fold_in(k, 3), 0.5, (8,))
    assert m.shape == (8,)

    tc2 = TrainConfig(rng_impl="threefry2x32")
    k2 = train_rng(tc2)
    assert k2.dtype == jnp.uint32            # raw PRNGKey for reproducibility
    k3 = train_rng(tc2, offset=1)
    assert not np.array_equal(np.asarray(k2), np.asarray(k3))
