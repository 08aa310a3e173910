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


# ---------------------------------------------------------------------------
# Swin-composed full-model parity (VERDICT r2 item 3): the reference's
# Conv_layer 'swintransformer' branch (model.py:204-226) — including its
# hidden parse_option() sys.argv re-parse and the ./modules/*.pth load
# (monkeypatched to an empty state dict, loaded strict=False) — feeding
# the fusion encoder, and the 5-D two-view IU X-Ray branch
# (model.py:240-253) through caption training + greedy/beam decode.
# ---------------------------------------------------------------------------

# Small-but-real Swin geometry whose final feature dim is 768 (so no
# resnet_fc projection fires, exactly like Swin-S): img 56 / patch 4 →
# 14x14 tokens, one merge → 7x7 = 49 tokens of 384*2 = 768 channels.
SWIN_TEST = dict(img_size=56, embed_dim=384, depths=(2, 2),
                 num_heads=(4, 8), window_size=7)


@pytest.fixture(scope="module")
def swin_argv_yaml(tmp_path_factory):
    """A real YAML for the reference's parse_option() (the hidden argv
    re-parse at model.py:205 → swin_transformer_config.py:257-296)."""
    import yaml
    path = tmp_path_factory.mktemp("swincfg") / "swin_test.yaml"
    path.write_text(yaml.safe_dump({
        "MODEL": {"TYPE": "swin", "NAME": "swin_test",
                  "DROP_PATH_RATE": 0.0,
                  "SWIN": {"EMBED_DIM": SWIN_TEST["embed_dim"],
                           "DEPTHS": list(SWIN_TEST["depths"]),
                           "NUM_HEADS": list(SWIN_TEST["num_heads"]),
                           "WINDOW_SIZE": SWIN_TEST["window_size"],
                           "PATCH_SIZE": 4}},
        "DATA": {"IMG_SIZE": SWIN_TEST["img_size"]}}))
    return str(path)


def _build_ref_swin_model(ref, tokenizer, config_cls, swin_argv_yaml,
                          monkeypatch, seed, **cfg_kw):
    """Reference MVLBertForX with conv='swintransformer', built the way the
    reference builds it: parse_option() re-parses sys.argv (model.py:205)
    and torch.load pulls the .pth (model.py:222-226; absent here → empty
    'model' dict, strict=False load keeps the random init)."""
    mcfg = sys.modules["modules.config"]
    config = getattr(mcfg, config_cls)(
        num_hidden_layers=LAYERS, intermediate_size=INTER,
        conv="swintransformer")
    # set AFTER construction: the reference __init__ overwrites kwargs
    # with its class defaults (config.py:29-38)
    for k, v in cfg_kw.items():
        setattr(config, k, v)
    config.update_special_tokens(tokenizer)
    monkeypatch.setattr(sys, "argv", ["test", "--cfg", swin_argv_yaml])
    import torch as _torch
    monkeypatch.setattr(_torch, "load", lambda *a, **k: {"model": {}})
    torch.manual_seed(seed)
    if config_cls == "MVLBertConfigForImageCaption":
        return config, getattr(ref, "MVLBertForImageCaption")(
            config, tokenizer).eval()
    name = {"MVLBertConfigforVQA": "MVLBertForVQA"}[config_cls]
    return config, getattr(ref, name)(config).eval()


def _our_swin_config(tokenizer, **kw):
    from mvlt_tpu.config import SwinConfig
    fusion = FusionConfig(num_hidden_layers=LAYERS, intermediate_size=INTER)
    swin = SwinConfig(drop_path_rate=0.0, **SWIN_TEST)
    return MVLTConfig(fusion=fusion, conv="swin", swin=swin,
                      **kw).with_tokenizer(tokenizer)


def test_vqa_swin_composed_logits(ref, tokenizer, swin_argv_yaml,
                                  monkeypatch):
    """Composed Conv_layer('swintransformer') → 49 Swin tokens → fusion →
    VQA head, logits ≤2e-4 vs the reference end-to-end."""
    config, ref_model = _build_ref_swin_model(
        ref, tokenizer, "MVLBertConfigforVQA", swin_argv_yaml, monkeypatch,
        seed=11, result_num=10)

    rng = np.random.default_rng(12)
    image = rng.normal(size=(B, 3, SWIN_TEST["img_size"],
                             SWIN_TEST["img_size"])).astype(np.float32)
    q = rng.integers(1000, 29000, size=(B, QLEN)).astype(np.int64)
    q[0, -2:] = 0
    with torch.no_grad():
        ref_prob, ref_logits = ref_model(
            torch.from_numpy(image), torch.from_numpy(q), None)

    cfg = _our_swin_config(tokenizer, result_num=10)
    model = VQAModel(cfg)
    sd = convert.state_dict_to_numpy(ref_model.state_dict())
    variables = convert.vqa_from_torch(sd, num_layers=LAYERS, conv="swin",
                                       depths=SWIN_TEST["depths"])
    prob, logits = model.apply(variables, jnp.asarray(image),
                               jnp.asarray(q, jnp.int32),
                               deterministic=True)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=2e-4, rtol=1e-4)


@pytest.fixture(scope="module")
def swin_caption_pair(ref, tokenizer, swin_argv_yaml):
    """Two-view (B,2,3,56,56) caption model pair on the composed Swin
    path: 49+49 = 98 image tokens (model.py:240-253)."""
    mp = pytest.MonkeyPatch()
    try:
        config, ref_model = _build_ref_swin_model(
            ref, tokenizer, "MVLBertConfigForImageCaption", swin_argv_yaml,
            mp, seed=13)
        config.max_length = 8
        ref_model = shim_legacy_cache(ref_model)
    finally:
        mp.undo()

    cfg = _our_swin_config(tokenizer, is_decoder=True, max_length=8)
    model = CaptionModel(cfg)
    sd = convert.state_dict_to_numpy(ref_model.state_dict())
    variables = convert.caption_from_torch(sd, num_layers=LAYERS,
                                           conv="swin",
                                           depths=SWIN_TEST["depths"])
    rng = np.random.default_rng(14)
    image = rng.normal(size=(B, 2, 3, SWIN_TEST["img_size"],
                             SWIN_TEST["img_size"])).astype(np.float32)
    feat = model.apply(variables, jnp.asarray(image),
                       method=lambda m, im: m.encode_image(im))
    assert feat.shape[1] == 98          # two-view: 49 + 49 tokens
    return ref_model, model, variables, cfg, image, feat


def test_caption_swin_twoview_training_logits(swin_caption_pair):
    """encode_forward training logits through the composed two-view
    Swin path (model.py:240-253 + 520-546), unilm strategy."""
    ref_model, model, variables, cfg, image, feat = swin_caption_pair
    rng = np.random.default_rng(15)
    cap = rng.integers(1000, 29000, size=(B, 8)).astype(np.int64)
    with torch.no_grad():
        ref_logits = ref_model(torch.from_numpy(image),
                               torch.from_numpy(cap), num_beams=0,
                               learning_strategy="unilm")
    ref_logits = ref_logits.transpose(1, 2).numpy()
    logits = model.apply(variables, jnp.asarray(image),
                         jnp.asarray(cap, jnp.int32), "unilm",
                         deterministic=True)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4,
                               rtol=1e-4)


def test_caption_swin_twoview_greedy_parity(swin_caption_pair):
    """Token-for-token greedy equality through the composed two-view Swin
    path vs the reference loop (model.py:826-984)."""
    from mvlt_tpu.models.generation import GenerationSpec, greedy_search
    ref_model, model, variables, cfg, image, feat = swin_caption_pair
    with torch.no_grad():
        ref_ids, _ = ref_model(torch.from_numpy(image), None, num_beams=1,
                               learning_strategy="unilm")
    ref_ids = ref_ids.numpy()
    spec = GenerationSpec.from_config(cfg, num_beams=1, strategy="unilm")
    ids, _ = greedy_search(model, variables, feat, spec)
    ids = np.asarray(ids)
    T = ref_ids.shape[1]
    np.testing.assert_array_equal(ids[:, :T], ref_ids)


def test_caption_swin_twoview_beam_parity(swin_caption_pair):
    """Token-for-token beam-3 equality through the composed two-view Swin
    path vs the reference loop (model.py:636-816)."""
    from mvlt_tpu.models.generation import GenerationSpec, beam_search
    ref_model, model, variables, cfg, image, feat = swin_caption_pair
    with torch.no_grad():
        ref_seqs = ref_model(torch.from_numpy(image), None, num_beams=3,
                             learning_strategy="unilm")
    ref_seqs = ref_seqs.numpy()
    spec = GenerationSpec.from_config(cfg, num_beams=3, strategy="unilm")
    seqs, lens, scores = beam_search(model, variables, feat, spec)
    seqs, lens = np.asarray(seqs), np.asarray(lens)
    T = ref_seqs.shape[1]
    for b in range(ref_seqs.shape[0]):
        got = np.where(np.arange(T) < lens[b], seqs[b, :T],
                       spec.pad_token_id)
        np.testing.assert_array_equal(got, ref_seqs[b])


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
