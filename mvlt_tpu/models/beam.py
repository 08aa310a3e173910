"""Static-shape beam-search scorer with HF ``BeamSearchScorer`` semantics.

The reference drives HF's ``BeamSearchScorer.process``/``finalize``
(``modules/model.py:743-753, 800-802``) with defaults: length_penalty=1.0,
do_early_stopping=False, num_beam_hyps_to_keep=1.  This module re-expresses
those exact semantics with static shapes and masks so the whole search runs
inside ``lax.while_loop``:

- finished hypotheses live in fixed (B, K) slots; "add" replaces the
  worst slot when the new length-penalized score beats it (HF
  ``BeamHypotheses.add``);
- ``process`` walks the 2K ranked candidates (statically unrolled), routing
  eos candidates with rank < K into the hypothesis slots and the first K
  non-eos candidates into the next beams (HF ``process``);
- ``is_done`` for early_stopping=False: count >= K and
  worst >= best_possible / cur_len (HF ``BeamHypotheses.is_done``);
- scoring uses HF's quirky ``cur_len = seq_len + 1`` length accounting.

All ops are vectorized over the batch; candidate order within a step is
preserved by the sequential (unrolled) rank loop, so multiple eos
candidates interact with the hypothesis heap exactly like HF's list code.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp



@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BeamHypothesesState:
    """Fixed-slot replacement for HF BeamHypotheses (per batch row)."""

    seqs: jnp.ndarray    # (B, K, L_max) int32
    scores: jnp.ndarray  # (B, K) f32, length-penalized; empty slots = -inf
    lens: jnp.ndarray    # (B, K) int32
    done: jnp.ndarray    # (B,) bool


def init_hypotheses(batch: int, num_beams: int, max_len: int) -> BeamHypothesesState:
    return BeamHypothesesState(
        seqs=jnp.zeros((batch, num_beams, max_len), jnp.int32),
        scores=jnp.full((batch, num_beams), -jnp.inf, jnp.float32),
        lens=jnp.zeros((batch, num_beams), jnp.int32),
        done=jnp.zeros((batch,), bool),
    )


def _hyp_add(state: BeamHypothesesState, add_mask: jnp.ndarray,
             seq: jnp.ndarray, seq_len, sum_logprobs: jnp.ndarray,
             gen_len, length_penalty: float) -> BeamHypothesesState:
    """Conditionally add one hypothesis per batch row.

    add_mask: (B,) bool; seq: (B, L_max); sum_logprobs: (B,).
    Mirrors BeamHypotheses.add: keep if fewer than K stored or better than
    the worst; evict the worst.  Empty slots score -inf, so 'fewer than K'
    is subsumed by 'better than the worst'.
    """
    score = sum_logprobs / jnp.asarray(gen_len, jnp.float32) ** length_penalty
    worst = jnp.min(state.scores, axis=1)            # (B,)
    worst_idx = jnp.argmin(state.scores, axis=1)     # (B,)
    do = add_mask & (score > worst)
    onehot = jnp.arange(state.scores.shape[1])[None, :] == worst_idx[:, None]
    put = onehot & do[:, None]                       # (B, K)
    scores = jnp.where(put, score[:, None], state.scores)
    lens = jnp.where(put, jnp.asarray(seq_len, jnp.int32), state.lens)
    seqs = jnp.where(put[:, :, None], seq[:, None, :], state.seqs)
    return dataclasses.replace(state, seqs=seqs, scores=scores, lens=lens)


def process(state: BeamHypothesesState,
            input_seqs: jnp.ndarray,      # (B, K, L_max) current beams
            seq_len,                      # committed tokens per beam (scalar)
            next_scores: jnp.ndarray,     # (B, 2K) sorted desc
            next_tokens: jnp.ndarray,     # (B, 2K)
            next_indices: jnp.ndarray,    # (B, 2K) beam index within batch
            *, pad_token_id: int, eos_token_id: int,
            length_penalty: float = 1.0, early_stopping: bool = False,
            cur_len=None,
            ) -> Tuple[BeamHypothesesState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One HF BeamSearchScorer.process step, vectorized over the batch.

    Returns (state, beam_scores (B,K), beam_tokens (B,K), beam_indices (B,K))
    where beam_indices are in [0, K) (per-batch).
    ``cur_len`` defaults to HF's ``seq_len + 1``.
    """
    B, two_k = next_scores.shape
    K = two_k // 2
    if cur_len is None:
        cur_len = seq_len + 1

    beam_scores = jnp.zeros((B, K), jnp.float32)
    beam_tokens = jnp.full((B, K), pad_token_id, jnp.int32)
    beam_indices = jnp.zeros((B, K), jnp.int32)
    fill_count = jnp.zeros((B,), jnp.int32)
    was_done = state.done

    for rank in range(two_k):
        tok = next_tokens[:, rank]
        score = next_scores[:, rank]
        idx = next_indices[:, rank]
        is_eos = tok == eos_token_id
        # ---- eos candidates with rank < K  ->  hypothesis heap
        if rank < K:
            add_mask = is_eos & ~was_done
            cand_seq = jnp.take_along_axis(
                input_seqs, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
            state = _hyp_add(state, add_mask, cand_seq, seq_len, score,
                             cur_len, length_penalty)
        # ---- non-eos candidates -> next beams (first K of them)
        fill = (~is_eos) & (fill_count < K) & ~was_done
        slot_onehot = (jnp.arange(K)[None, :] == fill_count[:, None]) & fill[:, None]
        beam_scores = jnp.where(slot_onehot, score[:, None], beam_scores)
        beam_tokens = jnp.where(slot_onehot, tok[:, None], beam_tokens)
        beam_indices = jnp.where(slot_onehot, idx[:, None], beam_indices)
        fill_count = fill_count + fill.astype(jnp.int32)

    # done batches keep padding (scores 0, token pad, index 0) — HF pads them
    # is_done update (early_stopping=False heuristic)
    count = jnp.sum(state.scores > -jnp.inf, axis=1)
    worst = jnp.min(jnp.where(state.scores > -jnp.inf, state.scores, jnp.inf), axis=1)
    best_possible = next_scores.max(axis=1) / jnp.asarray(cur_len, jnp.float32) ** length_penalty
    if early_stopping:
        now_done = count >= K
    else:
        now_done = (count >= K) & (worst >= best_possible)
    done = was_done | now_done
    state = dataclasses.replace(state, done=done)
    return state, beam_scores, beam_tokens, beam_indices


def finalize(state: BeamHypothesesState,
             input_seqs: jnp.ndarray,   # (B, K, L_max)
             seq_len,                   # committed length (scalar)
             final_beam_scores: jnp.ndarray,  # (B, K)
             *, max_length: int, pad_token_id: int, eos_token_id: int,
             length_penalty: float = 1.0,
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """HF BeamSearchScorer.finalize with num_beam_hyps_to_keep=1.

    Open beams of not-done batches are added (score = sum_logprobs / len),
    then the best hypothesis per batch is emitted, padded to ``max_length``
    with eos appended when it fits.  Returns (sequences (B, max_length),
    lengths (B,), scores (B,)).
    """
    B, K, L = input_seqs.shape
    for k in range(K):
        state = _hyp_add(state, ~state.done, input_seqs[:, k], seq_len,
                         final_beam_scores[:, k], seq_len, length_penalty)

    best = jnp.argmax(state.scores, axis=1)                    # (B,)
    best_seq = jnp.take_along_axis(
        state.seqs, best[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    best_len = jnp.take_along_axis(state.lens, best[:, None], axis=1)[:, 0]
    best_score = jnp.take_along_axis(state.scores, best[:, None], axis=1)[:, 0]

    pos = jnp.arange(L)[None, :]
    out = jnp.where(pos < best_len[:, None], best_seq, pad_token_id)
    # append eos where the hypothesis ended before max_length
    can_eos = best_len < max_length
    out = jnp.where((pos == best_len[:, None]) & can_eos[:, None],
                    eos_token_id, out)
    out_len = jnp.where(can_eos, best_len + 1, best_len)
    if L > max_length:
        out = out[:, :max_length]
    return out, out_len, best_score
