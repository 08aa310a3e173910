"""Checkpoint/resume: TrainState roundtrip (incl. optimizer state — the
reference never saved it, SURVEY.md §5), pretrained export, pruning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import MVLTConfig, SwinConfig
from mvlt_tpu.models.heads import VQAModel
from mvlt_tpu.train import create_train_state, make_optimizer, make_vqa_step
from mvlt_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def tiny_state():
    import dataclasses
    from mvlt_tpu.config import FusionConfig
    cfg = MVLTConfig(
        conv="linear",
        fusion=FusionConfig(hidden_size=32, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=64,
                            vocab_size=64, max_position_embeddings=64),
        cls_token_id=3, sep_token_id=4, eos_token_id=5, mask_token_id=6,
        result_num=3)
    model = VQAModel(cfg)
    img = jnp.zeros((2, 3, 32, 32), jnp.float32)
    q = jnp.ones((2, 4), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, q)
    state = create_train_state(model, variables, make_optimizer(cfg))
    # take one real step so optimizer moments are nonzero
    step = make_vqa_step(model)
    batch = {"image": img, "question": q,
             "label": jnp.zeros((2,), jnp.int32)}
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    return cfg, model, state


def test_train_state_roundtrip(tiny_state, tmp_path_factory):
    cfg, model, state = tiny_state
    path = str(tmp_path_factory.mktemp("ckpt"))
    ckpt.save_checkpoint(path, state)

    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((2, 3, 32, 32), jnp.float32),
                           jnp.ones((2, 4), jnp.int32))
    fresh = create_train_state(model, variables, make_optimizer(cfg))
    restored, ok = ckpt.restore_checkpoint(path, fresh)
    assert ok
    assert int(restored.step) == int(state.step) == 1
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_missing_returns_flag(tiny_state, tmp_path_factory):
    _, _, state = tiny_state
    path = str(tmp_path_factory.mktemp("empty"))
    _, ok = ckpt.restore_checkpoint(path, state)
    assert not ok


def test_pruning_keeps_latest(tiny_state, tmp_path_factory):
    _, _, state = tiny_state
    path = str(tmp_path_factory.mktemp("prune"))
    for s in range(5):
        ckpt.save_checkpoint(path, state, step=s, keep=2)
    import os
    steps = sorted(os.listdir(path))
    assert steps == ["step_00000003", "step_00000004"]


def test_pretrained_export_roundtrip(tiny_state, tmp_path_factory):
    cfg, model, state = tiny_state
    path = str(tmp_path_factory.mktemp("export"))
    ckpt.save_pretrained(path, cfg, {"params": state.params,
                                     **state.extra_variables})
    cfg2, variables = ckpt.load_pretrained(path)
    assert cfg2.result_num == cfg.result_num
    assert cfg2.fusion.hidden_size == cfg.fusion.hidden_size
    out1 = model.apply({"params": state.params, **state.extra_variables},
                       jnp.zeros((1, 3, 32, 32)), jnp.ones((1, 4), jnp.int32))
    out2 = model.apply(variables, jnp.zeros((1, 3, 32, 32)),
                       jnp.ones((1, 4), jnp.int32))
    np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]),
                               atol=1e-6)


def test_interrupted_save_tmp_dirs_ignored(tmp_path):
    """Orbax step_N.orbax-checkpoint-tmp-<ts> leftovers must not be
    restored or counted toward keep."""
    import os
    from mvlt_tpu.utils.checkpoint import latest_checkpoint

    os.makedirs(tmp_path / "step_00000005")
    os.makedirs(tmp_path / "step_00000007.orbax-checkpoint-tmp-12345")
    got = latest_checkpoint(str(tmp_path))
    assert got is not None and got.endswith("step_00000005")


def test_async_save_roundtrip_and_prune(tiny_state, tmp_path_factory):
    """async_save returns before the write completes but the checkpoint is
    committed by wait (or by latest_checkpoint, which waits); successive
    async saves prune like sync ones."""
    import os
    cfg, model, state = tiny_state
    path = str(tmp_path_factory.mktemp("async"))
    for s in range(4):
        ckpt.save_checkpoint(path, state, step=s, keep=2, async_save=True)
    ckpt.wait_for_async_saves()

    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((2, 3, 32, 32), jnp.float32),
                           jnp.ones((2, 4), jnp.int32))
    fresh = create_train_state(model, variables, make_optimizer(cfg))
    restored, ok = ckpt.restore_checkpoint(path, fresh)
    assert ok
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # keep=2 (+ the most recent save may persist transiently; wait() above
    # committed it, and the NEXT save prunes — so at most keep+1 on disk)
    steps = sorted(d for d in os.listdir(path) if "-tmp-" not in d)
    assert steps[-1] == "step_00000003"
    assert len(steps) <= 3
