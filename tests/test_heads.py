"""Task-head models: shapes, losses, MLM-head parity vs HF BertOnlyMLMHead,
and CE-ignore-index parity vs torch."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import FusionConfig, MVLTConfig
from mvlt_tpu.models.heads import (CaptionModel, MLMHead, PretrainModel,
                                   RetrievalModel, VQAModel)
from mvlt_tpu.ops.layers import cross_entropy_ignore_index

TINY_FUSION = FusionConfig(vocab_size=50, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, intermediate_size=64,
                           max_position_embeddings=64)


def tiny_cfg(**kw):
    base = dict(fusion=TINY_FUSION, conv="linear", result_num=10,
                cls_token_id=3, sep_token_id=4, mask_token_id=6,
                eos_token_id=5, max_length=8)
    base.update(kw)
    return MVLTConfig(**base)


B, L = 2, 7
IMG = (B, 3, 32, 32)  # linear patch 16 -> 2x2 = 4 tokens


def _img(seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*IMG), jnp.float32)


def _txt(seed=1):
    t = np.random.RandomState(seed).randint(7, 50, size=(B, L))
    t[0, 5:] = 0
    return jnp.asarray(t, jnp.int32)


def test_vqa_shapes_and_loss():
    cfg = tiny_cfg()
    model = VQAModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), _img(), _txt())
    prob, logits = model.apply(variables, _img(), _txt())
    assert logits.shape == (B, cfg.result_num)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, rtol=1e-5)

    label = jnp.asarray([1, -100])  # unanswerable -> ignored
    loss, _ = model.apply(variables, _img(), _txt(), label,
                          method=VQAModel.loss, deterministic=True)
    logp = jax.nn.log_softmax(logits, -1)
    np.testing.assert_allclose(float(loss), -float(logp[0, 1]), rtol=1e-5)


@pytest.mark.parametrize("seq2seq", [False, True])
def test_pretrain_loss(seq2seq):
    cfg = tiny_cfg(itm_task=True)
    model = PretrainModel(cfg)
    labels = np.full((B, L), -100, np.int64)
    labels[:, 2] = 9
    itm = jnp.asarray([1, 0])
    variables = model.init(jax.random.PRNGKey(0), _img(), _txt(),
                           jnp.asarray(labels), itm, seq2seq=seq2seq)
    loss, metrics = model.apply(variables, _img(), _txt(), jnp.asarray(labels),
                                itm, seq2seq=seq2seq)
    assert np.isfinite(float(loss))
    assert float(metrics["mlm_loss"]) > 0 and float(metrics["itm_loss"]) > 0
    np.testing.assert_allclose(float(loss),
                               float(metrics["mlm_loss"] + metrics["itm_loss"]),
                               rtol=1e-6)


def test_pretrain_heads_differ_by_mask_mode():
    cfg = tiny_cfg(itm_task=False)
    model = PretrainModel(cfg)
    labels = jnp.full((B, L), 2, jnp.int32)
    itm = jnp.asarray([1, 1])
    variables = model.init(jax.random.PRNGKey(0), _img(), _txt(), labels, itm)
    l1, _ = model.apply(variables, _img(), _txt(), labels, itm, seq2seq=True)
    l2, _ = model.apply(variables, _img(), _txt(), labels, itm, seq2seq=False)
    assert abs(float(l1) - float(l2)) > 1e-6  # different heads + masks


def test_retrieval_score():
    cfg = tiny_cfg()
    model = RetrievalModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), _img(), _txt())
    logits = model.apply(variables, _img(), _txt())
    assert logits.shape == (B, 2)
    score = model.apply(variables, _img(), _txt(), method=RetrievalModel.score)
    assert score.shape == (B,)
    assert np.all((np.asarray(score) >= 0) & (np.asarray(score) <= 1))


def test_caption_strategies():
    cfg = tiny_cfg(is_decoder=True)
    model = CaptionModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), _img(), _txt())
    unilm = model.apply(variables, _img(), _txt(), "unilm")
    normal = model.apply(variables, _img(), _txt(), "normal")
    assert unilm.shape == (B, L, TINY_FUSION.vocab_size)
    assert normal.shape == unilm.shape
    # unilm probes each token's own hidden; normal shifts by one — they differ
    assert float(jnp.abs(unilm - normal).max()) > 1e-4


def test_mlm_head_parity_vs_hf():
    torch = pytest.importorskip("torch")
    from transformers.models.bert.configuration_bert import BertConfig
    from transformers.models.bert.modeling_bert import BertOnlyMLMHead

    from mvlt_tpu.utils import convert

    hf_cfg = BertConfig(vocab_size=50, hidden_size=32, intermediate_size=64,
                        hidden_act="gelu", layer_norm_eps=1e-12)
    torch.manual_seed(0)
    head = BertOnlyMLMHead(hf_cfg).eval()
    x = np.random.RandomState(0).randn(B, L, 32).astype(np.float32)
    with torch.no_grad():
        expected = head(torch.tensor(x)).numpy()

    sd = convert.state_dict_to_numpy(head.state_dict())
    converted = convert.mlm_head_from_torch(sd, prefix="")
    params = {**converted["transform"], "decoder": converted["decoder"]}
    ours = MLMHead(hidden_size=32, vocab_size=50)
    out = ours.apply({"params": {"transform": {
        "transform_dense": params["transform_dense"],
        "transform_layernorm": params["transform_layernorm"]},
        "decoder": params["decoder"]}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5, atol=2e-5)


def test_ce_ignore_index_parity_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 9, 11).astype(np.float32)  # (B, L, V)
    labels = rng.randint(0, 11, size=(4, 9))
    labels[0, :5] = -100
    labels[2] = -100
    ours = cross_entropy_ignore_index(jnp.asarray(logits), jnp.asarray(labels))
    theirs = torch.nn.functional.cross_entropy(
        torch.tensor(logits).transpose(1, 2), torch.tensor(labels),
        ignore_index=-100)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-6)
