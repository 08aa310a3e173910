"""Our static-shape beam scorer vs HF BeamSearchScorer, driven with random
score streams exactly the way the reference drives it (model.py:687-816)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mvlt_tpu.models import beam as jbeam

torch = pytest.importorskip("torch")
from transformers.generation.beam_search import BeamSearchScorer  # noqa: E402

V = 12          # vocab
EOS, PAD = 2, 0
MAX_LEN = 9


def _run_pair(seed, B=2, K=3, steps=MAX_LEN, eos_boost=0.0,
              length_penalty=1.0, early_stopping=False):
    rng = np.random.RandomState(seed)

    hf = BeamSearchScorer(batch_size=B, num_beams=K, device="cpu",
                          length_penalty=length_penalty,
                          do_early_stopping=early_stopping)
    hf_input_ids = None
    hf_beam_scores = torch.zeros((B, K), dtype=torch.float)
    hf_beam_scores[:, 1:] = -1e9
    hf_beam_scores = hf_beam_scores.view(-1)
    hf_done_at = None

    st = jbeam.init_hypotheses(B, K, MAX_LEN)
    j_seqs = jnp.zeros((B, K, MAX_LEN), jnp.int32)
    j_scores = jnp.concatenate(
        [jnp.zeros((B, 1)), jnp.full((B, K - 1), -1e9)], axis=1).astype(jnp.float32)

    final_t = steps
    for t in range(steps):
        logits = rng.randn(B * K, V).astype(np.float32)
        logits[:, EOS] += eos_boost
        logp = torch.log_softmax(torch.tensor(logits), dim=-1)

        # ---- HF side (mirrors reference model.py:708-775)
        nts = logp + hf_beam_scores[:, None]
        nts = nts.view(B, K * V)
        nts, ntk = torch.topk(nts, 2 * K, dim=1, largest=True, sorted=True)
        nidx = torch.div(ntk, V, rounding_mode="floor")
        ntok = ntk % V
        if hf_input_ids is None:
            hf_input_ids = torch.full((B * K, 1), 103, dtype=torch.long)  # [MASK] col
        out = hf.process(hf_input_ids, nts, ntok, nidx,
                         pad_token_id=PAD, eos_token_id=EOS)
        hf_beam_scores = out["next_beam_scores"]
        hf_tokens = out["next_beam_tokens"]
        hf_idx = out["next_beam_indices"]
        if t == 0:
            hf_input_ids = hf_tokens.unsqueeze(-1)
        else:
            hf_input_ids = torch.cat(
                [hf_input_ids[hf_idx, :], hf_tokens.unsqueeze(-1)], dim=-1)

        # ---- ours
        jnts = jnp.asarray(logp.numpy()) + j_scores.reshape(-1)[:, None]
        jnts = jnts.reshape(B, K * V)
        top_scores, top_k = jnp.sort(jnts, axis=1)[:, ::-1][:, :2 * K], None
        order = jnp.argsort(-jnts, axis=1)[:, :2 * K]
        top_scores = jnp.take_along_axis(jnts, order, axis=1)
        top_tok = (order % V).astype(jnp.int32)
        top_idx = (order // V).astype(jnp.int32)

        if t == 0:
            # HF's step-0 quirk: hypotheses added at t=0 capture the 1-token
            # [MASK] column and use cur_len=2 (input_ids len 1 + 1)
            probe = jnp.full((B, K, MAX_LEN), 0, jnp.int32)
            probe = probe.at[:, :, 0].set(103)
            st, jbs, jbt, jbi = jbeam.process(
                st, probe, 1, top_scores, top_tok, top_idx,
                pad_token_id=PAD, eos_token_id=EOS, cur_len=2,
                length_penalty=length_penalty, early_stopping=early_stopping)
            j_seqs = jnp.zeros((B, K, MAX_LEN), jnp.int32)
            j_seqs = j_seqs.at[:, :, 0].set(jbt)
            seq_len = 1
        else:
            st, jbs, jbt, jbi = jbeam.process(
                st, j_seqs, t, top_scores, top_tok, top_idx,
                pad_token_id=PAD, eos_token_id=EOS,
                length_penalty=length_penalty, early_stopping=early_stopping)
            gathered = jnp.take_along_axis(j_seqs, jbi[:, :, None], axis=1)
            j_seqs = gathered.at[:, :, t].set(jbt)
            seq_len = t + 1
        j_scores = jbs

        # ---- compare step outputs
        np.testing.assert_allclose(np.asarray(jbs).reshape(-1),
                                   hf_beam_scores.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(jbt).reshape(-1),
                                      hf_tokens.numpy())
        # HF pads done batches with ABSOLUTE index 0 (batch 0 beam 0); those
        # rows are never consumed, so compare indices for live batches only.
        hf_rel_idx = (hf_idx.view(B, K) - torch.arange(B)[:, None] * K).numpy()
        live = ~np.asarray(st.done)
        np.testing.assert_array_equal(np.asarray(jbi)[live], hf_rel_idx[live])
        np.testing.assert_array_equal(np.asarray(st.done), hf._done.numpy())

        if bool(hf._done.all()):
            final_t = t + 1
            break

    # ---- finalize
    hf_fin = hf.finalize(hf_input_ids, hf_beam_scores, None, None, MAX_LEN,
                         pad_token_id=PAD, eos_token_id=EOS)
    seq_len = final_t if final_t > 0 else 1
    j_out, j_len, j_score = jbeam.finalize(
        st, j_seqs, seq_len, j_scores, max_length=MAX_LEN,
        pad_token_id=PAD, eos_token_id=EOS, length_penalty=length_penalty)

    hf_seq = hf_fin["sequences"].numpy()
    j_np = np.asarray(j_out)
    for b in range(B):
        L = hf_seq.shape[1]
        np.testing.assert_array_equal(j_np[b, :L], hf_seq[b],
                                      err_msg=f"batch {b} seed {seed}")
        assert np.all(j_np[b, L:] == PAD) or L == MAX_LEN
    np.testing.assert_allclose(np.asarray(j_score),
                               hf_fin["sequence_scores"].numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_no_eos_runs_to_max(seed):
    _run_pair(seed, eos_boost=-100.0)  # eos never chosen


@pytest.mark.parametrize("seed", range(10))
def test_with_eos(seed):
    _run_pair(seed, eos_boost=2.0)  # frequent eos: exercises hyp heap + done


@pytest.mark.parametrize("seed", range(4))
def test_heavy_eos(seed):
    _run_pair(seed, eos_boost=6.0, K=4)


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("lp", [0.6, 2.0])
def test_length_penalty_variants(seed, lp):
    _run_pair(seed, eos_boost=2.0, length_penalty=lp)


@pytest.mark.parametrize("seed", range(4))
def test_early_stopping(seed):
    _run_pair(seed, eos_boost=2.0, early_stopping=True)
