"""Generation engine tests: KV-cached greedy/beam vs full-forward oracles,
including an HF-BeamSearchScorer-driven end-to-end beam oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import FusionConfig, MVLTConfig
from mvlt_tpu.models.generation import (GenerationSpec, beam_search,
                                        generate, greedy_search)
from mvlt_tpu.models.heads import CaptionModel

TINY_FUSION = FusionConfig(vocab_size=40, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, intermediate_size=64,
                           max_position_embeddings=64)
CFG = MVLTConfig(fusion=TINY_FUSION, conv="linear", is_decoder=True,
                 max_length=6, cls_token_id=3, sep_token_id=4,
                 eos_token_id=5, mask_token_id=6, pad_token_id=0)

B = 2
IMG = (B, 3, 32, 32)


@pytest.fixture(scope="module")
def setup():
    model = CaptionModel(CFG)
    img = jnp.asarray(np.random.RandomState(0).randn(*IMG), jnp.float32)
    txt = jnp.ones((B, 5), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt)
    feat = model.apply(variables, img, method=lambda m, im: m.encode_image(im))
    return model, variables, img, feat


def _full_forward_logits(model, variables, feat, text):
    """Uncached oracle: full seq2seq forward, last-position logits."""
    def run(m, f, t):
        image_mask = jnp.ones(f.shape[:2], bool)
        tm = None if t is None else (t > 0)
        out = m.fusion(t, tm, f, image_mask, seq2seq_mask=True,
                       deterministic=True)
        return m.mlm_head_seq2seq(out.last_hidden[:, -1])
    return model.apply(variables, feat, text, method=run)


def _oracle_greedy(model, variables, feat, spec):
    """Reference greedy loop (model.py:826-984) without KV cache."""
    ids = np.full((B, spec.max_length), spec.pad_token_id, np.int32)
    unfinished = np.ones(B, np.int32)
    committed = []
    for t in range(spec.max_length):
        if spec.strategy == "unilm":
            cols = committed + [[spec.mask_token_id] * B]
        else:
            cols = committed if committed else None
        if cols is None:
            text = None
        else:
            text = jnp.asarray(np.stack(cols, axis=1), jnp.int32)
        logits = np.asarray(_full_forward_logits(model, variables, feat, text))
        tok = logits.argmax(-1).astype(np.int32)
        tok = tok * unfinished + spec.pad_token_id * (1 - unfinished)
        ids[:, t] = tok
        unfinished = unfinished * (tok != spec.eos_token_id)
        committed.append(tok.tolist())
        if unfinished.max() == 0:
            break
    return ids


@pytest.mark.parametrize("strategy", ["unilm", "normal"])
def test_greedy_matches_uncached_oracle(setup, strategy):
    model, variables, img, feat = setup
    spec = GenerationSpec.from_config(CFG, num_beams=1, strategy=strategy)
    ids, scores = greedy_search(model, variables, feat, spec)
    oracle = _oracle_greedy(model, variables, feat, spec)
    np.testing.assert_array_equal(np.asarray(ids), oracle)
    assert scores.shape == (B, spec.max_length)


def test_sampling_reproducible(setup):
    model, variables, img, feat = setup
    spec = GenerationSpec.from_config(CFG, num_beams=1, sample=True)
    rng = jax.random.PRNGKey(7)
    ids1, _ = greedy_search(model, variables, feat, spec, rng)
    ids2, _ = greedy_search(model, variables, feat, spec, rng)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))


def _oracle_beam(model, variables, feat, spec):
    """Reference beam loop (model.py:636-816) without KV cache, using the
    real HF BeamSearchScorer as the scoring oracle."""
    torch = pytest.importorskip("torch")
    from transformers.generation.beam_search import BeamSearchScorer

    K = spec.num_beams
    feat_exp = jnp.repeat(feat, K, axis=0)
    scorer = BeamSearchScorer(batch_size=B, num_beams=K, device="cpu")
    beam_scores = torch.zeros((B, K))
    beam_scores[:, 1:] = -1e9
    beam_scores = beam_scores.view(-1)
    input_ids = None
    cur_len = 0
    while cur_len < spec.max_length:
        if spec.strategy == "unilm":
            if input_ids is None:
                text = np.full((B * K, 1), spec.mask_token_id, np.int64)
            else:
                text = np.concatenate(
                    [input_ids.numpy(),
                     np.full((B * K, 1), spec.mask_token_id, np.int64)], axis=1)
        else:
            text = input_ids.numpy() if input_ids is not None else None
        jtext = None if text is None else jnp.asarray(text, jnp.int32)
        logits = np.asarray(_full_forward_logits(model, variables, feat_exp, jtext))
        if input_ids is None:
            if spec.strategy == "unilm":
                input_ids = torch.full((B * K, 1), spec.mask_token_id,
                                       dtype=torch.long)
            else:
                input_ids = torch.full((B * K, 1), spec.sep_token_id,
                                       dtype=torch.long)
        nts = torch.log_softmax(torch.tensor(logits), dim=-1)
        nts = nts + beam_scores[:, None]
        V = nts.shape[-1]
        nts = nts.view(B, K * V)
        nts, ntk = torch.topk(nts, 2 * K, dim=1, largest=True, sorted=True)
        nidx = torch.div(ntk, V, rounding_mode="floor")
        ntok = ntk % V
        out = scorer.process(input_ids, nts, ntok, nidx,
                             pad_token_id=spec.pad_token_id,
                             eos_token_id=spec.eos_token_id)
        beam_scores = out["next_beam_scores"]
        beam_tokens = out["next_beam_tokens"]
        beam_idx = out["next_beam_indices"]
        if cur_len == 0:
            input_ids = beam_tokens.unsqueeze(-1)
        else:
            input_ids = torch.cat(
                [input_ids[beam_idx, :], beam_tokens.unsqueeze(-1)], dim=-1)
        cur_len += 1
        if scorer.is_done:
            break
    fin = scorer.finalize(input_ids, beam_scores, None, None, spec.max_length,
                          pad_token_id=spec.pad_token_id,
                          eos_token_id=spec.eos_token_id)
    return fin["sequences"].numpy(), fin["sequence_scores"].numpy()


@pytest.mark.parametrize("num_beams", [2, 3])
def test_beam_matches_hf_oracle(setup, num_beams):
    model, variables, img, feat = setup
    spec = GenerationSpec.from_config(CFG, num_beams=num_beams)
    seqs, lens, scores = beam_search(model, variables, feat, spec)
    o_seqs, o_scores = _oracle_beam(model, variables, feat, spec)
    s = np.asarray(seqs)
    for b in range(B):
        L = o_seqs.shape[1]
        np.testing.assert_array_equal(s[b, :L], o_seqs[b])
        assert np.all(s[b, L:] == spec.pad_token_id)
    np.testing.assert_allclose(np.asarray(scores), o_scores, rtol=1e-4, atol=1e-5)


def test_generate_dispatch(setup):
    model, variables, img, feat = setup
    g = generate(model, variables, img, GenerationSpec.from_config(CFG, 1))
    assert g[0].shape == (B, CFG.max_length)
    bm = generate(model, variables, img, GenerationSpec.from_config(CFG, 2))
    assert bm[0].shape == (B, CFG.max_length)


def test_generate_two_view_images(setup):
    """IU X-Ray path: 5-D (B, 2, C, H, W) input through generate()
    (reference run_report_generation_cxr.py two-view + beam)."""
    model, variables, _, _ = setup
    import numpy as np
    from mvlt_tpu.models.generation import GenerationSpec, generate

    spec = GenerationSpec.from_config(CFG, num_beams=2)
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 2, 3, 32, 32)).astype(np.float32))
    seqs = generate(model, variables, img, spec)[0]
    assert seqs.shape[0] == 2
    assert seqs.shape[1] <= spec.max_length


@pytest.mark.parametrize("num_beams", [1, 2])
def test_unrolled_decode_matches_loop(setup, num_beams):
    """spec.unroll=True must produce identical sequences/scores to the
    lax.while_loop path."""
    model, variables, img, _ = setup
    from mvlt_tpu.models.generation import GenerationSpec, generate

    base = GenerationSpec.from_config(CFG, num_beams=num_beams)
    import dataclasses as dc
    looped = generate(model, variables, img, base)
    unrolled = generate(model, variables, img, dc.replace(base, unroll=True))
    for a, b in zip(looped, unrolled):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_suffix_reorder_matches_full_gather(setup):
    """Beam suffix-only cache reorder is exact: prefix rows are identical
    across a sample's beams, so gathering only positions >= prefix_len
    must produce identical sequences and scores."""
    model, variables, img, _ = setup
    import dataclasses as dc
    from mvlt_tpu.models.generation import GenerationSpec, generate

    base = GenerationSpec.from_config(CFG, num_beams=3)
    full = generate(model, variables, img, base)
    suffix = generate(model, variables, img,
                      dc.replace(base, suffix_reorder=True))
    for a, b in zip(full, suffix):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_sampling_bf16_model(setup):
    """Sampling with a bf16 model: the log-softmax score gather must cast
    to f32 before writing into the f32 scores buffer."""
    model_bf16 = CaptionModel(CFG, dtype=jnp.bfloat16)
    img = jnp.asarray(np.random.RandomState(0).randn(*IMG), jnp.float32)
    txt = jnp.ones((B, 5), jnp.int32)
    variables = model_bf16.init(jax.random.PRNGKey(0), img, txt)
    feat = model_bf16.apply(variables, img,
                            method=lambda m, im: m.encode_image(im))
    spec = GenerationSpec.from_config(CFG, num_beams=1, sample=True)
    ids, scores = greedy_search(model_bf16, variables, feat, spec,
                                jax.random.PRNGKey(3))
    assert scores.dtype == jnp.float32
    assert np.isfinite(np.asarray(scores)).all()
