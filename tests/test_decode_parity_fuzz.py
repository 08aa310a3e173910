"""Decode-parity fuzz vs the reference loops at config-of-record scale.

VERDICT r2 item 4: the round-2 decode parity stopped at beams {2,3},
max_length 8, one weight seed.  The reference's config of record is
``num_beams=5`` (run_report_generation_cxr.py:331) with max_length
60-150, and its loops have behavior that only shows up at scale:

- the early ``is_done`` exit when every batch element's beam hypotheses
  are saturated (model.py:777-778),
- ``BeamSearchScorer.finalize``'s length-cap handling of unfinished
  hypotheses (model.py:800-802),
- greedy per-sample EOS bookkeeping / pad backfill
  (``_update_seq_length_for_generation``, model.py:986-999).

This module fuzzes token-for-token equality over beams {1,3,5} x
max_length {16,48} x 3 weight seeds on batches engineered to contain
BOTH early finishers and length-cap hitters.  Random-init logits are
nearly flat (init std 0.02), so EOS never fires naturally; to create a
realistic mixed-finish regime the EOS row of the (converted, shared)
MLM decoder is amplified x10 and its bias shifted so the EOS logit
races the competitor max, and per-sample image magnitudes differ
(the reference's unapplied-LN quirk lets image scale reach the encoder,
diverging the per-sample trajectories).

Known reference crash, avoided by construction: if EVERY sample emits
EOS at step 1, the reference's own greedy loop raises on
``torch.cat([])`` (model.py:984 — ``output_token_probs`` is appended
only after the all-finished break check).
"""

import dataclasses
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from conftest import REFERENCE_ROOT, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

sys.path.insert(0, "/root/repo/tests")
from reference_oracle import load_reference, shim_legacy_cache  # noqa: E402

from mvlt_tpu.config import FusionConfig, MVLTConfig  # noqa: E402
from mvlt_tpu.models.generation import (GenerationSpec,  # noqa: E402
                                        beam_search, greedy_search)
from mvlt_tpu.models.heads import CaptionModel  # noqa: E402
from mvlt_tpu.utils import convert  # noqa: E402

LAYERS = 2
INTER = 512
IMG = 32
B = 4
# per-sample image magnitudes: the scale diversity diverges the greedy
# trajectories so EOS crossings happen at different steps per sample
IMAGE_SCALES = np.array([1.0, 4.0, 10.0, 25.0])
EOS_W_SCALE = 10.0
EOS_BIAS_SHIFT = -2.8


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def tokenizer():
    from transformers import BertTokenizer
    return BertTokenizer.from_pretrained(
        f"{REFERENCE_ROOT}/dataset/bert-base-uncased")


@pytest.fixture(scope="module")
def pairs(ref, tokenizer):
    """(seed, two_view) -> (ref_model, our model, variables, cfg, image,
    feat); built lazily, cached for the module (the 30523-vocab decoder is
    the bulk of the build cost)."""
    cache = {}

    def get(seed, two_view=False):
        if (seed, two_view) in cache:
            return cache[(seed, two_view)]
        mcfg = sys.modules["modules.config"]
        config = mcfg.MVLBertConfigForImageCaption(
            num_hidden_layers=LAYERS, intermediate_size=INTER, conv="linear")
        config.update_special_tokens(tokenizer)
        torch.manual_seed(seed)
        ref_model = shim_legacy_cache(
            ref.MVLBertForImageCaption(config, tokenizer).eval())
        # engineer the EOS race (see module docstring); mutate BEFORE
        # conversion so both models share the exact same weights
        pred = ref_model.MLM_head_seq2seq.predictions
        eos = config.eos_token_id
        with torch.no_grad():
            pred.decoder.weight.data[eos] *= EOS_W_SCALE
            pred.bias.data[eos] += EOS_BIAS_SHIFT

        fusion = FusionConfig(num_hidden_layers=LAYERS,
                              intermediate_size=INTER)
        cfg = MVLTConfig(fusion=fusion, conv="linear",
                         is_decoder=True).with_tokenizer(tokenizer)
        model = CaptionModel(cfg)
        sd = convert.state_dict_to_numpy(ref_model.state_dict())
        variables = convert.caption_from_torch(sd, num_layers=LAYERS,
                                               conv="linear")
        rng = np.random.default_rng(seed + 100)
        if two_view:
            # IU X-Ray's (B, 2, 3, H, W) branch (model.py:240-253) is
            # conv-agnostic in the reference Conv_layer.forward
            image = (rng.normal(size=(B, 2, 3, IMG, IMG))
                     * IMAGE_SCALES[:, None, None, None, None]
                     ).astype(np.float32)
        else:
            image = (rng.normal(size=(B, 3, IMG, IMG))
                     * IMAGE_SCALES[:, None, None, None]).astype(np.float32)
        feat = model.apply(variables, jnp.asarray(image),
                           method=lambda m, im: m.encode_image(im))
        cache[(seed, two_view)] = (ref_model, model, variables, cfg,
                                   image, feat)
        return cache[(seed, two_view)]

    return get


def _ref_lengths(seqs, eos_id):
    """Per-sample generated length (eos inclusive; cap if no eos)."""
    out = []
    for row in np.asarray(seqs):
        hits = np.nonzero(row == eos_id)[0]
        out.append(int(hits[0]) + 1 if hits.size else len(row))
    return np.array(out)


def _run_case(pair, num_beams, max_length):
    """Decode both sides, assert token-for-token equality; returns the
    reference per-sample lengths for finish-mix checks."""
    ref_model, model, variables, cfg, image, feat = pair
    ref_model.config.max_length = max_length  # read at decode time
    cfg = dataclasses.replace(cfg, max_length=max_length)
    spec = GenerationSpec.from_config(cfg, num_beams=num_beams,
                                      strategy="unilm")
    if num_beams == 1:
        with torch.no_grad():
            ref_ids, _ = ref_model(torch.from_numpy(image), None,
                                   num_beams=1, learning_strategy="unilm")
        ref_ids = ref_ids.numpy()
        ids, _ = greedy_search(model, variables, feat, spec)
        ids = np.asarray(ids)
        T = ref_ids.shape[1]
        np.testing.assert_array_equal(ids[:, :T], ref_ids)
        assert np.all(ids[:, T:] == spec.pad_token_id)
        return _ref_lengths(ref_ids, spec.eos_token_id)

    with torch.no_grad():
        ref_seqs = ref_model(torch.from_numpy(image), None,
                             num_beams=num_beams, learning_strategy="unilm")
    ref_seqs = ref_seqs.numpy()
    seqs, lens, _ = beam_search(model, variables, feat, spec)
    seqs, lens = np.asarray(seqs), np.asarray(lens)
    T = ref_seqs.shape[1]
    for b in range(ref_seqs.shape[0]):
        got = np.where(np.arange(T) < lens[b], seqs[b, :T],
                       spec.pad_token_id)
        np.testing.assert_array_equal(
            got, ref_seqs[b],
            err_msg=f"beam={num_beams} len={max_length} sample {b}")
    return _ref_lengths(ref_seqs, spec.eos_token_id)


@pytest.mark.parametrize("num_beams", [1, 3, 5])
@pytest.mark.parametrize("max_length", [16, 48])
def test_decode_parity_grid(pairs, num_beams, max_length):
    """Beams {1,3,5} x max_length {16,48} at one weight seed, mixed
    early-finish / cap-hit batch."""
    _run_case(pairs(5), num_beams, max_length)


@pytest.mark.parametrize("seed", [7, 21])
def test_decode_parity_extra_seeds(pairs, seed):
    """Two more weight seeds at beam 3 (different logit landscapes —
    different EOS-crossing steps and tie patterns)."""
    _run_case(pairs(seed), 3, 16)


@pytest.mark.slow
def test_decode_parity_config_of_record_mimic(pairs):
    """VERDICT r3 next #5: beam 5 at the MIMIC-CXR config of record —
    ``max_length=150`` (reference config.py:70,
    run_report_generation_cxr.py:188), single-view.  Exercises
    position-embedding indexing, static cache sizing, and beam
    bookkeeping over the full 150-step horizon vs the reference loop
    (model.py:636-816)."""
    lens = _run_case(pairs(5), 5, 150)
    # mixed-finish regime must survive the long horizon: at least one
    # sample should EOS well before the cap (is_done path), and the cap
    # finalize path is covered whenever any sample runs long
    assert (lens < 150).any(), f"no early finisher at 150: {lens}"


@pytest.mark.slow
def test_decode_parity_config_of_record_iuxray_twoview(pairs):
    """VERDICT r3 next #5: beam 5, ``max_length=60`` on the two-view
    (B, 2, 3, H, W) IU X-Ray branch (reference run_report_generation.py
    defaults; model.py:240-253 for the view concat)."""
    _run_case(pairs(5, two_view=True), 5, 60)


def test_finish_mix_is_exercised(pairs):
    """The engineered batch must actually contain BOTH an early
    finisher and a length-cap hitter at the config-of-record beam width
    — otherwise the grid above isn't testing is_done / cap finalize."""
    lens = _run_case(pairs(5), 5, 16)
    assert (lens < 16).any(), f"no early finisher: {lens}"
    assert (lens == 16).any(), f"no cap hitter: {lens}"
