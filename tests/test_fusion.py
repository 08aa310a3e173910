"""Fusion encoder parity vs HF BertEncoder + reference embedding semantics,
and internal consistency of the static-shape KV-cached decode path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import FusionConfig
from mvlt_tpu.models.fusion import FusionEncoder, init_cache
from mvlt_tpu.utils import convert

TINY = FusionConfig(vocab_size=50, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    max_position_embeddings=64, hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)
CLS, SEP = 3, 4


def _make_model(add_pooling=False):
    return FusionEncoder(TINY, add_pooling_layer=add_pooling,
                         cls_token_id=CLS, sep_token_id=SEP)


def _random_params(model, batch=2, n_obj=5, seq=7, seed=0):
    rng = jax.random.PRNGKey(seed)
    img = jnp.zeros((batch, n_obj, TINY.hidden_size))
    txt = jnp.ones((batch, seq), jnp.int32)
    variables = model.init(rng, txt, txt > 0, img, jnp.ones((batch, n_obj), bool))
    return variables


@pytest.fixture(scope="module")
def torch_side():
    torch = pytest.importorskip("torch")
    from transformers.models.bert.configuration_bert import BertConfig
    from transformers.models.bert.modeling_bert import BertEncoder, BertPooler

    hf_cfg = BertConfig(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        intermediate_size=TINY.intermediate_size,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        max_position_embeddings=TINY.max_position_embeddings,
        type_vocab_size=3, layer_norm_eps=1e-12)
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    encoder = BertEncoder(hf_cfg).eval()
    pooler = BertPooler(hf_cfg).eval()
    word = torch.nn.Embedding(TINY.vocab_size + 1, TINY.hidden_size)
    position = torch.nn.Embedding(TINY.max_position_embeddings, TINY.hidden_size)
    token_type = torch.nn.Embedding(3, TINY.hidden_size)
    for emb in (word, position, token_type):
        torch.nn.init.normal_(emb.weight, std=0.02)
    return torch, encoder, pooler, word, position, token_type


def _params_from_torch(torch_side):
    torch, encoder, pooler, word, position, token_type = torch_side
    sd = convert.state_dict_to_numpy(encoder.state_dict())
    params = convert.bert_encoder_from_torch(sd, TINY.num_hidden_layers)
    params["word_embeddings"] = {"embedding": word.weight.detach().numpy()}
    params["position_embeddings"] = {"embedding": position.weight.detach().numpy()}
    params["token_type_embeddings"] = {"embedding": token_type.weight.detach().numpy()}
    psd = convert.state_dict_to_numpy(pooler.state_dict())
    params["pooler"] = {"kernel": psd["dense.weight"].T, "bias": psd["dense.bias"]}
    params["pooler"] = {"dense": {"kernel": psd["dense.weight"].T,
                                  "bias": psd["dense.bias"]}}
    return {"params": params}


def _torch_reference_forward(torch_side, text_idx, text_mask, image_feature,
                             image_mask, seq2seq):
    """Oracle implementing the reference get_embedding + mask semantics
    (model.py:74-183) on top of HF BertEncoder."""
    torch, encoder, pooler, word, position, token_type = torch_side
    B, n_obj = image_feature.shape[:2]
    obj_end = n_obj + 1
    L = text_idx.shape[1]
    total = n_obj + L + 2

    cls = word(torch.full((B, 1), CLS, dtype=torch.long))
    sep = word(torch.full((B, 1), SEP, dtype=torch.long))
    txt = word(text_idx)
    vl = torch.cat([cls, image_feature, sep, txt], dim=1)
    pos_ids = torch.arange(total)
    tt = (pos_ids <= obj_end).long()
    emb = vl + token_type(tt)[None] + position(pos_ids)[None]

    if seq2seq:
        r = torch.arange(total)
        m = (r[None, :] <= r[:, None]) | (r[None, :] <= obj_end)
        mask = m[None].expand(B, -1, -1).float()
        ext = mask[:, None, :, :]
    else:
        ones = torch.ones(B, 1, dtype=torch.bool)
        mask = torch.cat([ones, image_mask, ones, text_mask], dim=1).float()
        ext = mask[:, None, None, :]
    bias = (1.0 - ext) * -10000.0

    with torch.no_grad():
        out = encoder(hidden_states=emb, attention_mask=bias)[0]
        pooled = pooler(out)
    return out.numpy(), pooled.numpy()


@pytest.mark.parametrize("seq2seq", [False, True])
def test_parity_vs_torch(torch_side, seq2seq):
    torch = torch_side[0]
    B, n_obj, L = 2, 5, 7
    rng = np.random.RandomState(0)
    img_np = rng.randn(B, n_obj, TINY.hidden_size).astype(np.float32)
    txt_np = rng.randint(5, TINY.vocab_size, size=(B, L)).astype(np.int64)
    txt_np[0, 5:] = 0  # padding
    tmask_np = txt_np > 0
    imask_np = np.ones((B, n_obj), dtype=bool)

    t_out, t_pooled = _torch_reference_forward(
        torch_side, torch.tensor(txt_np), torch.tensor(tmask_np),
        torch.tensor(img_np), torch.tensor(imask_np), seq2seq)

    model = _make_model(add_pooling=True)
    variables = _params_from_torch(torch_side)
    out = model.apply(variables, jnp.asarray(txt_np), jnp.asarray(tmask_np),
                      jnp.asarray(img_np), jnp.asarray(imask_np),
                      seq2seq_mask=seq2seq)
    np.testing.assert_allclose(np.asarray(out.last_hidden), t_out,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.pooled), t_pooled,
                               rtol=2e-5, atol=2e-5)


def test_text_image_split_indices():
    B, n_obj, L = 2, 5, 7
    model = _make_model()
    variables = _random_params(model, B, n_obj, L)
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(B, n_obj, TINY.hidden_size), jnp.float32)
    txt = jnp.asarray(rng.randint(5, 50, size=(B, L)), jnp.int32)
    out = model.apply(variables, txt, txt > 0, img, jnp.ones((B, n_obj), bool))
    assert out.obj_end == n_obj + 1
    assert out.text_end == n_obj + 1 + L + 1
    assert out.text_output().shape == (B, L, TINY.hidden_size)
    assert out.image_output().shape == (B, n_obj, TINY.hidden_size)
    assert out.sep_output().shape == (B, TINY.hidden_size)


def test_decode_step_matches_full_forward():
    """Incremental UniLM decoding must reproduce the full seq2seq forward:
    running prefix+[tokens] full vs stepping with the static cache."""
    B, n_obj = 2, 5
    model = _make_model()
    variables = _random_params(model, B, n_obj, 4)
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(B, n_obj, TINY.hidden_size), jnp.float32)
    imask = jnp.ones((B, n_obj), bool)
    MASK = 6
    gen = jnp.asarray(rng.randint(7, 50, size=(B, 3)), jnp.int32)  # 3 decoded tokens
    P = n_obj + 2  # prefix length: CLS + img + SEP

    # --- oracle: full forward over [prefix][t0 t1 t2 MASK] with seq2seq mask
    # (the reference feeds generated tokens + [MASK] and reads the [MASK]
    # hidden state as next-token logits, model.py:577-604)
    full_txt = jnp.concatenate([gen, jnp.full((B, 1), MASK, jnp.int32)], axis=1)
    full = model.apply(variables, full_txt, full_txt > 0, img, imask,
                       seq2seq_mask=True)
    oracle_last_hidden = full.last_hidden[:, -1]  # [MASK] probe after 3 tokens

    # --- incremental: prefill [CLS] img [SEP] [MASK], then 3 decode steps
    cache = init_cache(TINY, B, max_len=P + 8)
    prefill_txt = jnp.full((B, 1), MASK, jnp.int32)
    prefill = model.apply(variables, prefill_txt, prefill_txt > 0, img, imask,
                          seq2seq_mask=True, return_kv=True)
    # commit only the prefix (P slots); the [MASK] kv is discarded —
    # equivalent to the reference's cache truncation (model.py:890-894)
    for i, (k, v) in enumerate(prefill.kv):
        cache["k"] = cache["k"].at[i, :, :, :P].set(k[:, :, :P])
        cache["v"] = cache["v"].at[i, :, :, :P].set(v[:, :, :P])

    hidden = None
    for t in range(3):
        step_tokens = jnp.stack([gen[:, t], jnp.full((B,), MASK, jnp.int32)], axis=1)
        hidden, cache = model.apply(variables, step_tokens, cache,
                                    jnp.int32(P + t), method=FusionEncoder.decode_step)
    np.testing.assert_allclose(np.asarray(hidden[:, -1]),
                               np.asarray(oracle_last_hidden),
                               rtol=2e-5, atol=2e-5)


def test_fused_encoder_path_matches_xla_path(monkeypatch):
    """The Pallas fused-encoder path (forced via interpret on CPU) ==
    the XLA path through the full FusionEncoder, for both bidirectional
    and seq2seq masks, forward and gradient (the seq2seq/qbias support
    is what lets caption/pretrain seq2seq batches use the kernels)."""
    import dataclasses

    model = _make_model()
    B, n_obj, seq = 2, 5, 7
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randn(B, n_obj, TINY.hidden_size), jnp.float32)
    txt = jnp.asarray(rng.randint(5, 50, (B, seq)), jnp.int32)
    tmask = txt > 0
    imask = jnp.ones((B, n_obj), bool)
    variables = model.init(jax.random.PRNGKey(0), txt, tmask, img, imask)

    for seq2seq in (False, True):
        def run(v):
            out = model.apply(v, txt, tmask, img, imask,
                              seq2seq_mask=seq2seq)
            return out.last_hidden

        monkeypatch.setenv("MVLT_NO_FUSED_ENCODER", "1")
        monkeypatch.delenv("MVLT_FORCE_FUSED_ENCODER", raising=False)
        want = run(variables)
        gw = jax.grad(lambda v: run(v).sum())(variables)

        monkeypatch.delenv("MVLT_NO_FUSED_ENCODER", raising=False)
        monkeypatch.setenv("MVLT_FORCE_FUSED_ENCODER", "1")
        got = run(variables)
        gg = jax.grad(lambda v: run(v).sum())(variables)

        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gg),
                        jax.tree_util.tree_leaves(gw)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4)


def test_fused_encoder_training_dropout_runs(monkeypatch):
    """Training path with dropout active goes through the masked fused
    kernels (forced interpret): finite loss and gradients."""
    import dataclasses

    cfg = dataclasses.replace(TINY, hidden_dropout_prob=0.1,
                              attention_probs_dropout_prob=0.1)
    model = FusionEncoder(cfg, add_pooling_layer=False, cls_token_id=CLS,
                          sep_token_id=SEP)
    B, n_obj, seq = 2, 5, 7
    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.randn(B, n_obj, cfg.hidden_size), jnp.float32)
    txt = jnp.asarray(rng.randint(5, 50, (B, seq)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), txt, txt > 0, img,
                           jnp.ones((B, n_obj), bool))

    monkeypatch.setenv("MVLT_FORCE_FUSED_ENCODER", "1")

    def loss(v):
        out = model.apply(v, txt, txt > 0, img,
                          jnp.ones((B, n_obj), bool), seq2seq_mask=True,
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(7)})
        return (out.last_hidden.astype(jnp.float32) ** 2).mean()

    val, grads = jax.value_and_grad(loss)(variables)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
