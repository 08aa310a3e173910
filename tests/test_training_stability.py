"""Training-mode paths that most tests skip: active dropout + stochastic
depth with PRNG plumbing, bf16 compute, many-step stability (no NaN,
decreasing trend)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import (FusionConfig, MeshConfig, MVLTConfig, SwinConfig,
                             TrainConfig)
from mvlt_tpu.models.heads import PretrainModel
from mvlt_tpu.parallel import build_mesh
from mvlt_tpu.train import (create_train_state, make_optimizer,
                            make_pretrain_step, shard_train_state)

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _cfg(dtype_tag="f32"):
    return MVLTConfig(
        conv="swin",
        fusion=FusionConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            vocab_size=128, max_position_embeddings=64,
                            hidden_dropout_prob=0.1,
                            attention_probs_dropout_prob=0.1),
        swin=SwinConfig(img_size=32, patch_size=4, embed_dim=8, depths=(2, 2),
                        num_heads=(2, 4), window_size=4,
                        drop_path_rate=0.2, drop_rate=0.1,
                        attn_drop_rate=0.1),
        itm_task=True, lr=1e-3)


def _batch(n=8, rng=None):
    rng = rng or np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.normal(size=(n, 3, 32, 32)), jnp.float32),
        "caption_masked": jnp.asarray(rng.integers(1, 120, (n, 8)), jnp.int32),
        "caption_label": jnp.asarray(
            np.where(rng.random((n, 8)) < 0.3,
                     rng.integers(1, 120, (n, 8)), -100), jnp.int32),
        "itm_label": jnp.asarray(rng.integers(0, 2, (n,)), jnp.int32),
    }


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dropout_droppath_training_stability(dtype):
    cfg = _cfg()
    mesh = build_mesh(MeshConfig())
    model = PretrainModel(cfg, dtype=dtype)
    b = _batch()
    variables = model.init(jax.random.PRNGKey(0), b["image"],
                           b["caption_masked"], b["caption_label"],
                           b["itm_label"])
    state, shardings = shard_train_state(
        create_train_state(model, variables, make_optimizer(cfg)), mesh)
    step = make_pretrain_step(model, False, mesh, shardings)

    rng = np.random.default_rng(1)
    losses = []
    for i in range(20):
        batch = step.shard_batch(_batch(rng=rng))
        state, metrics = step(state, batch, jax.random.PRNGKey(5))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    # trend: mean of last 5 below mean of first 5
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_dropout_rngs_change_loss():
    """Same batch, different steps → different dropout masks (rng folded
    with the step counter) → different losses."""
    cfg = _cfg()
    mesh = build_mesh(MeshConfig())
    model = PretrainModel(cfg)
    b = _batch()
    variables = model.init(jax.random.PRNGKey(0), b["image"],
                           b["caption_masked"], b["caption_label"],
                           b["itm_label"])
    state, shardings = shard_train_state(
        create_train_state(model, variables, make_optimizer(cfg)), mesh)

    def loss_only(params, extra, batch, rng):
        rngs = {"dropout": rng}
        loss, _ = model.apply({"params": params, **extra}, batch["image"],
                              batch["caption_masked"],
                              batch["caption_label"], batch["itm_label"],
                              deterministic=False, rngs=rngs)
        return float(loss)

    l1 = loss_only(state.params, state.extra_variables, b,
                   jax.random.PRNGKey(1))
    l2 = loss_only(state.params, state.extra_variables, b,
                   jax.random.PRNGKey(2))
    assert l1 != l2
