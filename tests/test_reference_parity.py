"""Full-model golden parity against the ACTUAL reference implementation.

Each test builds the reference ``MVLBertForX`` (``/root/reference/modules/
model.py``) on a small linear-backbone config, converts its live state
dict with ``mvlt_tpu.utils.convert``, and asserts our model reproduces the
reference outputs: logits to <=1e-4 (f32) for VQA / pretraining /
retrieval forwards, and token-for-token equality of greedy and beam
decoding against the reference's own hand-rolled search loops
(model.py:636-816, 826-984).

The linear-patch backbone (visual_feature_extractor.py:47-59) is used so
the full path — Conv_layer adapter, embeddings (vocab+1 and unapplied-LN
quirks), mask construction, BertEncoder fusion, pooler, task heads,
KV-cached generation — is exercised end-to-end with the real 30522-token
vocab; the Swin/ResNet backbones have their own HF-golden tests
(tests/test_swin.py, test_backbones.py).
"""

import random
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from conftest import REFERENCE_ROOT, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

sys.path.insert(0, "/root/repo/tests")
from reference_oracle import load_reference, shim_legacy_cache  # noqa: E402

from mvlt_tpu.config import FusionConfig, MVLTConfig  # noqa: E402
from mvlt_tpu.models.heads import (CaptionModel, PretrainModel,  # noqa: E402
                                   RetrievalModel, VQAModel)
from mvlt_tpu.utils import convert  # noqa: E402

# Small-but-real geometry: hidden must be 768 (the linear patch projects
# to 768 channels, visual_feature_extractor.py:50), so shrink depth and
# the image instead. 32x32 image -> 2x2 = 4 image tokens.
LAYERS = 2
HIDDEN = 768
INTER = 512
IMG = 32
B = 2
QLEN = 7


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def tokenizer():
    from transformers import BertTokenizer
    return BertTokenizer.from_pretrained(
        f"{REFERENCE_ROOT}/dataset/bert-base-uncased")


def _ref_config(ref, tokenizer, cls):
    mcfg = sys.modules["modules.config"]
    config = getattr(mcfg, cls)(
        num_hidden_layers=LAYERS, intermediate_size=INTER, conv="linear")
    config.update_special_tokens(tokenizer)
    return config


def _our_config(tokenizer, dropout_hidden=0.1, dropout_attn=0.1, **kw):
    fusion = FusionConfig(num_hidden_layers=LAYERS, intermediate_size=INTER,
                          hidden_dropout_prob=dropout_hidden,
                          attention_probs_dropout_prob=dropout_attn)
    cfg = MVLTConfig(fusion=fusion, conv="linear", **kw)
    return cfg.with_tokenizer(tokenizer)


def _inputs(seed=0, qlen=QLEN):
    rng = np.random.default_rng(seed)
    image = rng.normal(size=(B, 3, IMG, IMG)).astype(np.float32)
    q = rng.integers(1000, 29000, size=(B, qlen)).astype(np.int64)
    q[0, -2:] = 0  # padding exercises the text mask
    q[1, -1:] = 0
    return image, q


def _convert(ref_model, builder):
    sd = convert.state_dict_to_numpy(ref_model.state_dict())
    return builder(sd, num_layers=LAYERS, conv="linear")


def test_vqa_full_model_logits(ref, tokenizer):
    """MVLBertForVQA forward (model.py:329-349) == VQAModel, f32 <=1e-4."""
    config = _ref_config(ref, tokenizer, "MVLBertConfigforVQA")
    config.result_num = 10
    torch.manual_seed(0)
    ref_model = ref.MVLBertForVQA(config).eval()

    image, q = _inputs(0)
    with torch.no_grad():
        ref_prob, ref_logits = ref_model(
            torch.from_numpy(image), torch.from_numpy(q), None)

    cfg = _our_config(tokenizer, result_num=10)
    model = VQAModel(cfg)
    variables = _convert(ref_model, convert.vqa_from_torch)
    prob, logits = model.apply(variables, jnp.asarray(image),
                               jnp.asarray(q, jnp.int32),
                               deterministic=True)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(prob), ref_prob.numpy(),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("seq2seq", [True, False])
def test_pretrain_full_model_loss(ref, tokenizer, seq2seq):
    """MVLBertForPretraining summed MLM+ITM loss (model.py:372-420) for
    both mask branches (the reference flips them with Python RNG)."""
    config = _ref_config(ref, tokenizer, "MVLBertPretrainConfig")
    config.ITM_task = True  # exercise both losses
    torch.manual_seed(1)
    ref_model = ref.MVLBertForPretraining(config).eval()

    image, cap = _inputs(1, qlen=9)
    rng = np.random.default_rng(2)
    label = np.where(rng.random((B, 9)) < 0.3,
                     rng.integers(1000, 29000, (B, 9)), -100).astype(np.int64)
    itm = rng.integers(0, 2, (B,)).astype(np.int64)

    # model.py:390-394: _p = random.random(); seq2seq iff _p < 0.5.
    # Seed the global RNG to pin the branch (seed 1 -> 0.134, seed 0 -> 0.844).
    random.seed(1 if seq2seq else 0)
    with torch.no_grad():
        ref_loss = ref_model(torch.from_numpy(image), torch.from_numpy(cap),
                             torch.from_numpy(label), torch.from_numpy(itm))

    cfg = _our_config(tokenizer, itm_task=True)
    model = PretrainModel(cfg)
    variables = _convert(ref_model, convert.pretrain_from_torch)
    loss, metrics = model.apply(
        variables, jnp.asarray(image), jnp.asarray(cap, jnp.int32),
        jnp.asarray(label, jnp.int32), jnp.asarray(itm, jnp.int32),
        seq2seq=seq2seq, deterministic=True)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-4,
                               rtol=1e-4)


def test_retrieval_full_model_prob(ref, tokenizer):
    """MVLBertForRetrieval (model.py:444-476): inference prob and training
    logits."""
    config = _ref_config(ref, tokenizer, "MVLBertRetrieval")
    torch.manual_seed(2)
    ref_model = ref.MVLBertForRetrieval(config).eval()

    image, cap = _inputs(3, qlen=8)
    with torch.no_grad():
        ref_prob = ref_model(torch.from_numpy(image), torch.from_numpy(cap))
        ref_logits = ref_model(torch.from_numpy(image), torch.from_numpy(cap),
                               image_text_label=torch.zeros(B,
                                                            dtype=torch.long))

    cfg = _our_config(tokenizer, dropout_hidden=0.0)
    model = RetrievalModel(cfg)
    variables = _convert(ref_model, convert.retrieval_from_torch)
    logits = model.apply(variables, jnp.asarray(image),
                         jnp.asarray(cap, jnp.int32), deterministic=True)
    prob = jax.nn.softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(prob), ref_prob.numpy(),
                               atol=1e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def caption_pair(ref, tokenizer):
    """(reference caption model, our model, our variables, image feats)."""
    config = _ref_config(ref, tokenizer, "MVLBertConfigForImageCaption")
    config.max_length = 8
    torch.manual_seed(5)
    ref_model = shim_legacy_cache(
        ref.MVLBertForImageCaption(config, tokenizer).eval())

    cfg = _our_config(tokenizer, is_decoder=True, max_length=8)
    model = CaptionModel(cfg)
    variables = _convert(ref_model, convert.caption_from_torch)
    image, _ = _inputs(6)
    feat = model.apply(variables, jnp.asarray(image),
                       method=lambda m, im: m.encode_image(im))
    return ref_model, model, variables, cfg, image, feat


@pytest.mark.parametrize("strategy", ["unilm"])
def test_greedy_token_parity(caption_pair, strategy):
    """Token-for-token greedy equality vs the reference's own
    greedy_search loop (model.py:826-984).

    Only 'unilm' (the published decode path): the reference's cached
    'normal' decode is broken in the reference itself — its incremental
    seq2seq mask is hard-coded to the last TWO rows (model.py:96-104)
    while 'normal' feeds the full generated prefix each step
    (prepare_inputs_for_generation, model.py:594-595), so shapes
    mismatch and it raises from step 2 on.  Our 'normal' decode works
    and is oracle-tested uncached in tests/test_generation.py."""
    from mvlt_tpu.models.generation import GenerationSpec, greedy_search
    ref_model, model, variables, cfg, image, feat = caption_pair
    with torch.no_grad():
        ref_ids, _ = ref_model(torch.from_numpy(image), None, num_beams=1,
                               learning_strategy=strategy)
    ref_ids = ref_ids.numpy()

    spec = GenerationSpec.from_config(cfg, num_beams=1, strategy=strategy)
    ids, _ = greedy_search(model, variables, feat, spec)
    ids = np.asarray(ids)
    T = ref_ids.shape[1]
    np.testing.assert_array_equal(ids[:, :T], ref_ids)
    assert np.all(ids[:, T:] == spec.pad_token_id)


@pytest.mark.parametrize("num_beams", [2, 3])
def test_beam_token_parity(caption_pair, num_beams):
    """Token-for-token beam-search equality vs the reference's hand-rolled
    loop + HF BeamSearchScorer (model.py:636-816)."""
    from mvlt_tpu.models.generation import GenerationSpec, beam_search
    ref_model, model, variables, cfg, image, feat = caption_pair
    with torch.no_grad():
        ref_seqs = ref_model(torch.from_numpy(image), None,
                             num_beams=num_beams, learning_strategy="unilm")
    ref_seqs = ref_seqs.numpy()

    spec = GenerationSpec.from_config(cfg, num_beams=num_beams,
                                      strategy="unilm")
    seqs, lens, scores = beam_search(model, variables, feat, spec)
    seqs, lens = np.asarray(seqs), np.asarray(lens)
    for b in range(ref_seqs.shape[0]):
        T = ref_seqs.shape[1]
        got = seqs[b, :T]
        # pad after length, as BeamSearchScorer.finalize does
        got = np.where(np.arange(T) < lens[b], got, spec.pad_token_id)
        np.testing.assert_array_equal(
            got, ref_seqs[b], err_msg=f"beam output differs for sample {b}")


def test_vendored_swin_backbone_parity(ref):
    """The reference's VENDORED Swin code (visual_feature_extractor.py:
    575-702, MSFT copy — not HF's reimplementation) == our
    SwinTransformer, converted with the same ``swin_from_torch`` mapping
    used for official ``.pth`` checkpoints."""
    import modules.visual_feature_extractor as vfe

    from mvlt_tpu.config import SwinConfig
    from mvlt_tpu.models.backbones.swin import SwinTransformer

    torch.manual_seed(7)
    ref_swin = vfe.SwinTransformer(
        img_size=32, patch_size=4, in_chans=3, num_classes=0, embed_dim=16,
        depths=[2, 2], num_heads=[2, 4], window_size=4, mlp_ratio=4.0,
        qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0, ape=False,
        patch_norm=True).eval()

    cfg = SwinConfig(img_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
                     num_heads=(2, 4), window_size=4, drop_path_rate=0.0)
    ours = SwinTransformer(cfg)
    sd = convert.state_dict_to_numpy(ref_swin.state_dict())
    params = convert.swin_from_torch(sd, cfg.depths)

    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref_swin(torch.from_numpy(x)).numpy()
    got = ours.apply({"params": params},
                     jnp.asarray(x.transpose(0, 2, 3, 1)),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("strategy", ["unilm", "normal"])
def test_caption_training_logits(ref, tokenizer, strategy):
    """encode_forward training logits (model.py:520-546), both
    strategies."""
    config = _ref_config(ref, tokenizer, "MVLBertConfigForImageCaption")
    torch.manual_seed(3)
    ref_model = ref.MVLBertForImageCaption(config, tokenizer).eval()

    image, cap = _inputs(4, qlen=8)
    with torch.no_grad():
        ref_logits = ref_model(torch.from_numpy(image), torch.from_numpy(cap),
                               num_beams=0, learning_strategy=strategy)
    # reference returns (batch, vocab, seq) — transpose to ours
    ref_logits = ref_logits.transpose(1, 2).numpy()

    cfg = _our_config(tokenizer, is_decoder=True)
    model = CaptionModel(cfg)
    variables = _convert(ref_model, convert.caption_from_torch)
    logits = model.apply(variables, jnp.asarray(image),
                         jnp.asarray(cap, jnp.int32), strategy,
                         deterministic=True)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-4,
                               rtol=1e-4)
