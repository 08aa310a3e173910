"""Rematerialization: remat'd backbone/fusion must be numerically
identical to plain execution, forward and gradients."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mvlt_tpu.config import FusionConfig, MVLTConfig, SwinConfig
from mvlt_tpu.models.heads import VQAModel


def _cfg(**kw):
    return MVLTConfig(
        conv="swin",
        fusion=FusionConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            vocab_size=64, max_position_embeddings=64),
        swin=SwinConfig(img_size=32, patch_size=4, embed_dim=8, depths=(1, 1),
                        num_heads=(2, 4), window_size=4, drop_path_rate=0.0),
        cls_token_id=3, sep_token_id=4, eos_token_id=5, mask_token_id=6,
        result_num=3, **kw)


def test_remat_forward_and_grad_match():
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 32, 32)).astype(np.float32))
    q = jnp.ones((2, 5), jnp.int32)
    label = jnp.zeros((2,), jnp.int32)

    plain = VQAModel(_cfg())
    rem = VQAModel(_cfg(remat_backbone=True, remat_fusion=True))
    params = plain.init(jax.random.PRNGKey(0), img, q)

    def loss(model, p):
        return model.apply(p, img, q, label, deterministic=True,
                           method=model.loss)[0]

    l1, g1 = jax.value_and_grad(lambda p: loss(plain, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(rem, p))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_remat_decode_step_runs():
    """decode_step under remat_fusion=True: the remat-wrapped layer's
    static_argnums require every positional arg (incl. need_kv) — this
    used to raise ValueError inside jax.remat."""
    import dataclasses
    from mvlt_tpu.models.generation import GenerationSpec, greedy_search
    from mvlt_tpu.models.heads import CaptionModel

    cfg = dataclasses.replace(
        _cfg(remat_fusion=True, is_decoder=True),
        conv="linear", max_length=6, cls_token_id=3, sep_token_id=4,
        eos_token_id=5, mask_token_id=6, pad_token_id=0)
    model = CaptionModel(cfg)
    img = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 3, 32, 32)).astype(np.float32))
    txt = jnp.ones((2, 5), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt)
    feat = model.apply(variables, img,
                       method=lambda m, im: m.encode_image(im))
    spec = GenerationSpec.from_config(cfg, num_beams=1)
    ids, scores = greedy_search(model, variables, feat, spec)
    assert ids.shape[0] == 2 and np.isfinite(np.asarray(scores)).all()
