"""Weight-only int8 serving (ops/quant.py): quantization error bounds,
tree selection/roundtrip, and end-to-end decode/logit parity on a tiny
model (an extension over the reference, which serves fp16/fp32 only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import FusionConfig, MVLTConfig
from mvlt_tpu.models.generation import GenerationSpec, generate
from mvlt_tpu.models.heads import CaptionModel, VQAModel
from mvlt_tpu.ops.quant import (dequantize_int8, dequantize_tree,
                                quantize_int8, quantize_tree,
                                quantized_bytes)

TINY_FUSION = FusionConfig(vocab_size=128, hidden_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=128,
                           max_position_embeddings=64)
CFG = MVLTConfig(fusion=TINY_FUSION, conv="linear", is_decoder=True,
                 max_length=6, cls_token_id=3, sep_token_id=4,
                 eos_token_id=5, mask_token_id=6, pad_token_id=0)


@pytest.mark.quick
def test_quantize_int8_error_bound():
    rng = np.random.default_rng(0)
    for shape in [(64, 64), (300, 128), (128, 65)]:
        w = jnp.asarray(rng.normal(size=shape) * rng.uniform(0.01, 3),
                        jnp.float32)
        q, s = quantize_int8(w)
        assert q.dtype == jnp.int8 and s.shape == (shape[-1],)
        deq = dequantize_int8(q, s, jnp.float32)
        err = np.abs(np.asarray(deq - w))
        bound = np.broadcast_to(np.asarray(s)[None, :] / 2 + 1e-7,
                                err.shape)
        np.testing.assert_array_less(err, bound)


@pytest.mark.quick
def test_quantize_int8_zero_column():
    w = jnp.zeros((64, 64), jnp.float32)
    q, s = quantize_int8(w)
    assert float(jnp.abs(dequantize_int8(q, s, jnp.float32)).max()) == 0.0


def test_quantize_tree_selection_and_roundtrip():
    model = VQAModel(CFG)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(1, 3, 32, 32)), jnp.float32)
    txt = jnp.ones((1, 5), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt)
    qparams, n_q = quantize_tree(variables["params"])
    assert n_q > 0
    # LN scales/biases and 1-D leaves untouched; quantized leaves are
    # int8+scale dicts; structure otherwise identical
    flat_q = jax.tree_util.tree_leaves_with_path(
        qparams, is_leaf=lambda x: isinstance(x, dict) and "__int8w__" in x)
    n_dicts = sum(1 for _, v in flat_q
                  if isinstance(v, dict) and "__int8w__" in v)
    assert n_dicts == n_q
    deq = dequantize_tree(qparams, jnp.float32)
    assert (jax.tree_util.tree_structure(deq)
            == jax.tree_util.tree_structure(variables["params"]))
    # dequantized values stay close to the originals (per-channel bound)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables["params"]),
            jax.tree_util.tree_leaves_with_path(deq)):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        if a.ndim == 2 and min(a.shape) >= 64:
            amax = np.abs(np.asarray(a)).max()
            assert np.abs(np.asarray(b) - np.asarray(a)).max() \
                <= amax / 127 / 2 + 1e-6
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    qb, ob = quantized_bytes(qparams)
    assert qb < 0.6 * ob  # ~2x smaller than bf16 (+ scale overhead)


def test_int8w_logit_and_decode_parity():
    """VQA logits under int8w stay close to baseline; caption decode
    inside jit with in-graph dequantization produces near-identical
    tokens (the eval_caption wiring)."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(2, 3, 32, 32)), jnp.float32)
    txt = jnp.ones((2, 5), jnp.int32)

    vqa = VQAModel(CFG)
    variables = vqa.init(jax.random.PRNGKey(0), img, txt)
    _, base = jax.jit(vqa.apply)(variables, img, txt)
    qparams, _ = quantize_tree(variables["params"])

    @jax.jit
    def quant_apply(qp, img, txt):
        return vqa.apply(dict(variables,
                              params=dequantize_tree(qp, jnp.float32)),
                         img, txt)

    _, ql = quant_apply(qparams, img, txt)
    b, q = np.asarray(base, np.float64), np.asarray(ql, np.float64)
    cos = (b * q).sum() / (np.linalg.norm(b) * np.linalg.norm(q) + 1e-12)
    assert cos > 0.999
    assert (b.argmax(-1) == q.argmax(-1)).all()

    cap = CaptionModel(CFG)
    cvars = cap.init(jax.random.PRNGKey(0), img, txt)
    spec = GenerationSpec.from_config(CFG, num_beams=2)
    base_seq = np.asarray(generate(cap, cvars, img, spec)[0])
    cq, _ = quantize_tree(cvars["params"])

    @jax.jit
    def quant_decode(qp, img):
        return generate(cap, dict(cvars,
                                  params=dequantize_tree(qp, jnp.float32)),
                        img, spec)[0]

    q_seq = np.asarray(quant_decode(cq, img))
    # tiny random model, beam-2: tokens should agree at >= 80% of
    # positions (ties near decision boundaries may flip under 8-bit
    # weights; exact agreement is not the contract)
    agree = (base_seq == q_seq).mean()
    assert agree >= 0.8, (base_seq, q_seq)
