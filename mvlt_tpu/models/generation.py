"""KV-cached autoregressive decoding (greedy / multinomial / beam) with
static shapes, re-designing the reference's generation engine
(``modules/model.py:479-999``) for XLA.

UniLM [MASK]-probe decoding: each step feeds ``[prev_token, MASK]``; the
[MASK] hidden state yields next-token logits.  The reference appends the
[MASK] to the KV cache and then slices it off (model.py:758-763, 890-894);
here the cache is a fixed buffer and the write index simply never commits
the [MASK] slot.  The 'normal' strategy feeds one token per step ([SEP]
hidden seeds the first token, model.py:537-541, 705).

Everything runs in ``lax.while_loop`` with early exit on eos / beam
completion; sequences are returned padded to ``max_length``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mvlt_tpu.config import MVLTConfig
from mvlt_tpu.models import beam as beam_lib
from mvlt_tpu.models.fusion import init_cache


@dataclasses.dataclass(frozen=True)
class GenerationSpec:
    max_length: int
    eos_token_id: int
    pad_token_id: int
    mask_token_id: int
    sep_token_id: int
    num_beams: int = 1
    length_penalty: float = 1.0
    early_stopping: bool = False
    strategy: str = "unilm"       # 'unilm' | 'normal'
    sample: bool = False
    # Run the decode loop as an unrolled program instead of
    # lax.while_loop. Identical results (done rows are masked exactly as
    # they are inside the loop); trades compile time and loses the
    # all-done early exit for much lower per-step overhead on runtimes
    # with body-size-proportional loop dispatch cost (NOTES.md: 16 ->
    # 4.2 ms/step on the axon tunnel).
    unroll: bool = False
    # Beam reorder gathers only the generated cache suffix (prefix rows
    # are identical across a sample's beams).  Exact; ~2.6x less reorder
    # traffic, one extra op per step — prefer on bandwidth-bound
    # production runtimes, off under dispatch-bound ones (see NOTES.md).
    suffix_reorder: bool = False

    @staticmethod
    def from_config(cfg: MVLTConfig, num_beams: int = 1, **kw) -> "GenerationSpec":
        return GenerationSpec(
            max_length=cfg.max_length, eos_token_id=cfg.eos_token_id,
            pad_token_id=cfg.pad_token_id, mask_token_id=cfg.mask_token_id,
            sep_token_id=cfg.sep_token_id, num_beams=num_beams, **kw)


# ---------------------------------------------------------------------------
# model plumbing: prefill + one decode step through the CaptionModel
# ---------------------------------------------------------------------------

def _prefill(model, variables, image_feature, spec: GenerationSpec):
    """Run the image prefix (+ initial [MASK] probe for unilm) through the
    fusion encoder.  Returns (first_logits (B,V), kv tuple, prefix_len)."""
    B = image_feature.shape[0]
    if spec.strategy == "unilm":
        txt = jnp.full((B, 1), spec.mask_token_id, jnp.int32)
    else:
        txt = None

    def run(m, feat, text):
        image_mask = jnp.ones(feat.shape[:2], bool)
        text_mask = None if text is None else (text > 0)
        out = m.fusion(text, text_mask, feat, image_mask, seq2seq_mask=True,
                       deterministic=True, return_kv=True)
        logits = m.mlm_head_seq2seq(out.last_hidden[:, -1])
        return logits, out.kv

    logits, kv = model.apply(variables, image_feature, txt, method=run)
    prefix_len = image_feature.shape[1] + 2  # CLS + image + SEP
    return logits, kv, prefix_len


def _make_cache(model, variables, kv, prefix_len: int, batch: int,
                spec: GenerationSpec, dtype=None):
    if dtype is None:
        # match the model's compute dtype: halves per-step cache traffic
        # for bf16 serving (KV rounding is within bf16 model noise)
        dtype = model.dtype if hasattr(model, "dtype") else jnp.float32
    cache = init_cache(model.config.fusion, batch,
                       prefix_len + spec.max_length + 1, dtype)
    k = jnp.stack([layer_kv[0][:, :, :prefix_len] for layer_kv in kv])
    v = jnp.stack([layer_kv[1][:, :, :prefix_len] for layer_kv in kv])
    cache["k"] = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype),
                                              (0, 0, 0, 0, 0))
    cache["v"] = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype),
                                              (0, 0, 0, 0, 0))
    return cache


def _decode_logits(model, variables, cache, prev_tok, write_pos,
                   spec: GenerationSpec):
    """One incremental step: returns (logits (B,V), new cache)."""
    B = prev_tok.shape[0]
    if spec.strategy == "unilm":
        tokens = jnp.stack(
            [prev_tok, jnp.full((B,), spec.mask_token_id, jnp.int32)], axis=1)
    else:
        tokens = prev_tok[:, None]

    def run(m, toks, c, pos):
        hidden, new_cache = m.fusion.decode_step(toks, c, pos)
        return m.mlm_head_seq2seq(hidden[:, -1]), new_cache

    return model.apply(variables, tokens, cache, write_pos, method=run)


# ---------------------------------------------------------------------------
# greedy / multinomial search  (reference model.py:826-984)
# ---------------------------------------------------------------------------

def greedy_search(model, variables, image_feature, spec: GenerationSpec,
                  rng: Optional[jax.Array] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ids (B, max_length) padded after eos, logprobs (B, max_length))."""
    B = image_feature.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    logits0, kv, P = _prefill(model, variables, image_feature, spec)
    cache = _make_cache(model, variables, kv, P, B, spec)

    def pick(logits, unfinished, key):
        if spec.sample:
            tok = jax.random.categorical(key, logits.astype(jnp.float32), axis=-1)
            score = jnp.take_along_axis(
                jax.nn.log_softmax(logits.astype(jnp.float32), -1),
                tok[:, None], axis=1)[:, 0]
        else:
            tok = jnp.argmax(logits, axis=-1)
            # NOTE greedy scores are RAW max logits while sampling returns
            # log-probs — the reference has the same asymmetry
            # (model.py:897 torch.max(next_token_logits) vs :904 gather of
            # log_softmax); kept for parity
            score = jnp.max(logits.astype(jnp.float32), axis=-1)
        tok = tok.astype(jnp.int32)
        # finished sequences emit pad (model.py:933-935); their score is
        # zeroed too — the while_loop path exits once all sequences
        # finish and leaves 0s, so the unrolled path (which keeps
        # executing body on pad-token steps) must match
        tok = tok * unfinished + spec.pad_token_id * (1 - unfinished)
        score = score * unfinished.astype(score.dtype)
        return tok, score

    ids = jnp.full((B, spec.max_length), spec.pad_token_id, jnp.int32)
    scores = jnp.zeros((B, spec.max_length), jnp.float32)
    unfinished = jnp.ones((B,), jnp.int32)

    rng, key0 = jax.random.split(rng)
    tok0, score0 = pick(logits0, unfinished, key0)
    ids = ids.at[:, 0].set(tok0)
    scores = scores.at[:, 0].set(score0)
    unfinished = unfinished * (tok0 != spec.eos_token_id).astype(jnp.int32)

    def cond(state):
        t, _, unfin, *_ = state
        return (t < spec.max_length) & (jnp.max(unfin) > 0)

    def body(state):
        t, prev, unfin, ids, scores, cache, rng = state
        rng, key = jax.random.split(rng)
        logits, cache = _decode_logits(model, variables, cache, prev,
                                       P + t - 1, spec)
        tok, score = pick(logits, unfin, key)
        ids = jax.lax.dynamic_update_slice(ids, tok[:, None], (0, t))
        scores = jax.lax.dynamic_update_slice(scores, score[:, None], (0, t))
        unfin = unfin * (tok != spec.eos_token_id).astype(jnp.int32)
        return (t + 1, tok, unfin, ids, scores, cache, rng)

    state = (jnp.int32(1), tok0, unfinished, ids, scores, cache, rng)
    if spec.unroll:
        for _t in range(1, spec.max_length):
            state = body(state)
        _, _, _, ids, scores, _, _ = state
    else:
        _, _, _, ids, scores, _, _ = jax.lax.while_loop(cond, body, state)
    return ids, scores


# ---------------------------------------------------------------------------
# beam search  (reference model.py:636-816 + HF scorer semantics in beam.py)
# ---------------------------------------------------------------------------

def beam_search(model, variables, image_feature, spec: GenerationSpec
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (sequences (B, max_length), lengths (B,), scores (B,))."""
    B = image_feature.shape[0]
    K = spec.num_beams
    V_ = None  # resolved from logits
    L = spec.max_length

    # Prefill ONCE per sample, then expand beam-wise: the reference
    # repeats the image K times before the forward (model.py:548-575),
    # running the whole prefix encoder K-fold on identical inputs; the
    # beam-expanded KV copies are bit-identical, so expanding the cache
    # after one prefill is exact and K times cheaper.
    logits0, kv, P = _prefill(model, variables, image_feature, spec)
    logits0 = jnp.repeat(logits0, K, axis=0)                # (B*K, V)
    kv = tuple((jnp.repeat(k_, K, axis=0), jnp.repeat(v_, K, axis=0))
               for k_, v_ in kv)
    cache = _make_cache(model, variables, kv, P, B * K, spec)
    V_ = logits0.shape[-1]

    beam_scores = jnp.concatenate(
        [jnp.zeros((B, 1)), jnp.full((B, K - 1), -1e9)], axis=1).astype(jnp.float32)
    hyps = beam_lib.init_hypotheses(B, K, L)
    seqs = jnp.zeros((B, K, L), jnp.int32)

    def rank_candidates(logits, beam_scores):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nts = logp + beam_scores.reshape(-1)[:, None]
        nts = nts.reshape(B, K * V_)
        order = jax.lax.top_k(nts, 2 * K)[1]
        top_scores = jnp.take_along_axis(nts, order, axis=1)
        return top_scores, (order % V_).astype(jnp.int32), (order // V_).astype(jnp.int32)

    # ---- step 0 (outside the loop; HF's [MASK]-column quirk, see beam.py)
    top_scores, top_tok, top_idx = rank_candidates(logits0, beam_scores)
    probe = jnp.zeros((B, K, L), jnp.int32).at[:, :, 0].set(
        spec.mask_token_id if spec.strategy == "unilm" else spec.sep_token_id)
    hyps, beam_scores, beam_tokens, beam_idx = beam_lib.process(
        hyps, probe, 1, top_scores, top_tok, top_idx,
        pad_token_id=spec.pad_token_id, eos_token_id=spec.eos_token_id,
        length_penalty=spec.length_penalty, early_stopping=spec.early_stopping,
        cur_len=2)
    seqs = seqs.at[:, :, 0].set(beam_tokens)
    # reorder cache by selected beams (all identical at step 0, but keep exact)
    flat_idx = (jnp.arange(B)[:, None] * K + beam_idx).reshape(-1)
    cache = {k: v[:, flat_idx] for k, v in cache.items()}
    prev = beam_tokens.reshape(-1)

    def cond(state):
        t, _, _, hyps, *_ = state
        return (t < L) & ~jnp.all(hyps.done)

    def body(state):
        t, prev, beam_scores, hyps, seqs, cache = state
        logits, cache = _decode_logits(model, variables, cache, prev,
                                       P + t - 1, spec)
        top_scores, top_tok, top_idx = rank_candidates(logits, beam_scores)
        hyps, beam_scores, beam_tokens, beam_idx = beam_lib.process(
            hyps, seqs, t, top_scores, top_tok, top_idx,
            pad_token_id=spec.pad_token_id, eos_token_id=spec.eos_token_id,
            length_penalty=spec.length_penalty,
            early_stopping=spec.early_stopping)
        seqs = jnp.take_along_axis(seqs, beam_idx[:, :, None], axis=1)
        seqs = jax.lax.dynamic_update_slice(
            seqs, beam_tokens[:, :, None], (0, 0, t))
        flat_idx = (jnp.arange(B)[:, None] * K + beam_idx).reshape(-1)
        # Beam reorder only needs the GENERATED suffix: prefix rows
        # (positions < P) are identical across a sample's beams at every
        # step (written once by the shared prefill), so gathering them is
        # a no-op — the reference gathers the full cache each step
        # (model.py:758-763).  The suffix-only form moves ~2.6x fewer
        # bytes but adds an op per step; under the axon tunnel's
        # body-size-proportional dispatch cost the full gather measures
        # FASTER, so suffix mode is opt-in for bandwidth-bound runtimes.
        if spec.suffix_reorder:
            def reorder(c):
                suf = c[:, flat_idx, :, P:]
                return jax.lax.dynamic_update_slice(c, suf, (0, 0, 0, P, 0))
            cache = {k: reorder(v) for k, v in cache.items()}
        else:
            cache = {k: v[:, flat_idx] for k, v in cache.items()}
        prev = beam_tokens.reshape(-1)
        return (t + 1, prev, beam_scores, hyps, seqs, cache)

    state = (jnp.int32(1), prev, beam_scores, hyps, seqs, cache)
    if spec.unroll:
        for _t in range(1, L):
            state = body(state)
        t, _, beam_scores, hyps, seqs, _ = state
    else:
        t, _, beam_scores, hyps, seqs, _ = jax.lax.while_loop(cond, body, state)

    return beam_lib.finalize(
        hyps, seqs, t, beam_scores, max_length=L,
        pad_token_id=spec.pad_token_id, eos_token_id=spec.eos_token_id,
        length_penalty=spec.length_penalty)


def generate(model, variables, image, spec: GenerationSpec,
             rng: Optional[jax.Array] = None):
    """Dispatch like the reference forward (model.py:503-515): beam when
    num_beams > 1, greedy/sample when == 1.  ``image`` is raw pixels; the
    backbone runs once here."""
    feat = model.apply(variables, image, method=lambda m, im: m.encode_image(im))
    if spec.num_beams > 1:
        return beam_search(model, variables, feat, spec)
    return greedy_search(model, variables, feat, spec, rng)
