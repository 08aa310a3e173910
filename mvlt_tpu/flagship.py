"""Flagship model builders shared by ``__graft_entry__.py`` and ``bench.py``.

The flagship configuration is the reference's config of record
(BASELINE.md): Swin-S @224 visual backbone + BERT-base single-stream fusion,
VQA head for the forward benchmark and the MLM+ITM pretraining head for the
full training step.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.config import (FusionConfig, MeshConfig, MVLTConfig, SwinConfig,
                             swin_small)
from mvlt_tpu.models.heads import PretrainModel, VQAModel


def flagship_vqa_config(result_num: int = 224) -> MVLTConfig:
    cfg = MVLTConfig.for_vqa(result_num=result_num)
    return dataclasses.replace(cfg, conv="swin", swin=swin_small())


def zeros_init(model, *example_args):
    """Shape-only init: zero params via eval_shape (fast, deterministic;
    benchmarks don't need trained weights)."""
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *example_args))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def build_vqa_forward(batch: int = 8, seq_len: int = 23,
                      dtype=jnp.bfloat16) -> Tuple:
    """(jittable_fn, example_args) for the flagship VQA forward pass
    (SLAKE config of record: Swin-S 224, question padded to 23)."""
    cfg = flagship_vqa_config()
    model = VQAModel(cfg, dtype=dtype)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(batch, 3, 224, 224)), jnp.float32)
    question = jnp.asarray(rng.integers(1, 30000, size=(batch, seq_len)),
                           jnp.int32)
    variables = zeros_init(model, image, question)

    def forward(variables, image, question):
        _, logits = model.apply(variables, image, question,
                                deterministic=True)
        return logits

    return forward, (variables, image, question)


def tiny_pretrain_config() -> MVLTConfig:
    """Structurally complete but tiny (for multi-chip dry runs on CPU)."""
    return MVLTConfig(
        conv="swin",
        fusion=FusionConfig(hidden_size=64, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=128,
                            vocab_size=512, max_position_embeddings=128),
        swin=SwinConfig(img_size=32, patch_size=4, embed_dim=16,
                        depths=(1, 1), num_heads=(2, 4), window_size=4,
                        drop_path_rate=0.0),
        itm_task=True, lr=1e-3)


def lower_flagship_multichip(n_devices: int, batch: int = 32,
                             seq_len: int = 80, mps=None,
                             devices=None) -> None:
    """AOT-lower AND COMPILE (no execution) the FLAGSHIP-geometry pretrain
    step (Swin-S @224 + BERT-base, MLM+ITM, b``batch``, L``seq_len``) over
    an ``n_devices`` mesh, for BOTH partitioning modes: DP-only shard_map
    and DP x TP GSPMD.  Inputs are abstract (``jax.ShapeDtypeStruct``), so
    no flagship-sized arrays materialize — this validates that the REAL
    shapes partition (Megatron rule coverage over every param, GSPMD
    propagation through the full fwd+bwd+AdamW graph), which the tiny
    dryrun geometry cannot (VERDICT r3 next #7)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mvlt_tpu.parallel import build_mesh
    from mvlt_tpu.train import (create_train_state, make_optimizer,
                                make_pretrain_step)

    cfg = dataclasses.replace(flagship_vqa_config(), itm_task=True,
                              max_length=seq_len)
    model = PretrainModel(cfg, dtype=jnp.bfloat16)
    batch_shapes = {
        "image": jax.ShapeDtypeStruct((batch, 3, 224, 224), jnp.float32),
        "caption_masked": jax.ShapeDtypeStruct((batch, seq_len), jnp.int32),
        "caption_label": jax.ShapeDtypeStruct((batch, seq_len), jnp.int32),
        "itm_label": jax.ShapeDtypeStruct((batch,), jnp.int32),
    }
    rng_shape = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    state_shapes = jax.eval_shape(
        lambda img, cm, cl, il: create_train_state(
            model, model.init(jax.random.PRNGKey(0), img, cm, cl, il),
            make_optimizer(cfg)),
        *(batch_shapes[k] for k in ("image", "caption_masked",
                                    "caption_label", "itm_label")))

    def with_shardings(shapes, shardings):
        return jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            shapes, shardings)

    devices = jax.devices()[:n_devices] if devices is None else devices
    if mps is None:
        mps = sorted({1, 2 if n_devices % 2 == 0 and n_devices > 1 else 1})
    for mp in mps:
        mesh = build_mesh(MeshConfig(model_parallel=mp), devices=devices)
        from mvlt_tpu.parallel.partition import param_shardings
        from mvlt_tpu.train.steps import _mirror_opt_shardings
        p_shard = param_shardings(state_shapes.params, mesh)
        opt_shard = _mirror_opt_shardings(state_shapes.opt_state,
                                          state_shapes.params, p_shard, mesh)
        repl = NamedSharding(mesh, P())
        shardings = state_shapes.replace(
            step=repl, params=p_shard, opt_state=opt_shard,
            extra_variables=jax.tree.map(lambda _: repl,
                                         state_shapes.extra_variables))
        data = NamedSharding(mesh, P("data"))
        abstract_state = with_shardings(state_shapes, shardings)
        abstract_batch = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=data),
            batch_shapes)
        abstract_rng = jax.ShapeDtypeStruct(rng_shape.shape, rng_shape.dtype,
                                            sharding=repl)
        step = make_pretrain_step(model, seq2seq=False, mesh=mesh,
                                  state_shardings=shardings)
        step.lower(abstract_state, abstract_batch, abstract_rng).compile()


def execute_flagship_multichip(n_devices: int, batch: int = 8,
                               seq_len: int = 80) -> float:
    """EXECUTE (not just compile) one REAL-SHAPE flagship pretrain step
    (Swin-S @224 + BERT-base, MLM+ITM, L``seq_len``) over an
    ``n_devices`` DP mesh with real arrays at a reduced batch.

    :func:`lower_flagship_multichip` proves the real shapes *partition*;
    this catches the runtime-only failure modes the AOT compile can't —
    sharded AdamW numerics, collective layouts at flagship widths, the
    donated-buffer update path — and asserts the loss is finite
    (VERDICT r4 item 5).  Params are zeros_init + a deterministic small
    perturbation so LN/softmax/loss paths see non-degenerate values
    without paying a flagship ``model.init`` compile.  Returns the loss."""
    from mvlt_tpu.parallel import build_mesh
    from mvlt_tpu.train import (create_train_state, make_optimizer,
                                make_pretrain_step, shard_train_state)

    cfg = dataclasses.replace(flagship_vqa_config(), itm_task=True,
                              max_length=seq_len)
    model = PretrainModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch_np = {
        "image": jnp.asarray(rng.normal(size=(batch, 3, 224, 224)),
                             jnp.float32),
        "caption_masked": jnp.asarray(
            rng.integers(1, 30000, (batch, seq_len)), jnp.int32),
        "caption_label": jnp.asarray(
            np.where(rng.random((batch, seq_len)) < 0.15,
                     rng.integers(1, 30000, (batch, seq_len)), -100),
            jnp.int32),
        "itm_label": jnp.asarray(rng.integers(0, 2, (batch,)), jnp.int32),
    }
    variables = zeros_init(model, *(batch_np[k] for k in
                                    ("image", "caption_masked",
                                     "caption_label", "itm_label")))

    def perturb(leaf):
        if leaf.dtype not in (jnp.float32, jnp.bfloat16):
            return leaf
        r = np.random.default_rng(leaf.size % 100003)
        return jnp.asarray(
            r.normal(scale=0.02, size=leaf.shape).astype(np.float32),
            leaf.dtype)

    variables = jax.tree.map(perturb, variables)
    mesh = build_mesh(MeshConfig(), devices=jax.devices()[:n_devices])
    state, shardings = shard_train_state(
        create_train_state(model, variables, make_optimizer(cfg)), mesh)
    step = make_pretrain_step(model, seq2seq=False, mesh=mesh,
                              state_shardings=shardings)
    state, metrics = step(state, step.shard_batch(batch_np),
                          jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite flagship sharded loss {loss}"
    assert int(state.step) == 1
    return loss


def dryrun_multichip(n_devices: int, geometry: str = "tiny") -> None:
    """Compile + execute ONE full sharded training step (fwd, bwd, AdamW)
    of the flagship pretraining model over an ``n_devices`` mesh with real
    DP x TP shardings (tiny shapes).  PP/SP/EP are N/A for this model
    family: it has no MoE and sequences are <=250 tokens (SURVEY.md §2.3).

    ``geometry='flagship'`` instead AOT-compiles (no execution) the real
    flagship-size step for both partitioning modes
    (:func:`lower_flagship_multichip`); ``geometry='flagship_exec'``
    EXECUTES a real-shape DP step at b8
    (:func:`execute_flagship_multichip`).
    """
    if geometry == "flagship":
        return lower_flagship_multichip(n_devices)
    if geometry == "flagship_exec":
        execute_flagship_multichip(n_devices)
        return None
    from mvlt_tpu.parallel import build_mesh
    from mvlt_tpu.train import (create_train_state, make_optimizer,
                                make_pretrain_step, shard_train_state)

    devices = jax.devices()[:n_devices]
    mp = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    mesh = build_mesh(MeshConfig(model_parallel=mp), devices=devices)

    cfg = tiny_pretrain_config()
    model = PretrainModel(cfg)
    dp = n_devices // mp
    B, L = max(2, dp), 8
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 3, 32, 32)), jnp.float32),
        "caption_masked": jnp.asarray(rng.integers(1, 400, (B, L)), jnp.int32),
        "caption_label": jnp.asarray(
            np.where(rng.random((B, L)) < 0.2,
                     rng.integers(1, 400, (B, L)), -100), jnp.int32),
        "itm_label": jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["image"],
                           batch["caption_masked"], batch["caption_label"],
                           batch["itm_label"])
    variables2 = jax.tree.map(jnp.array, variables)
    state = create_train_state(model, variables, make_optimizer(cfg))
    state, shardings = shard_train_state(state, mesh)
    step = make_pretrain_step(model, seq2seq=False, mesh=mesh,
                              state_shardings=shardings)
    state, metrics = step(state, step.shard_batch(batch),
                          jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    assert int(state.step) == 1

    # Also exercise the DP-only shard_map fast path (the partitioning
    # mode that keeps Mosaic kernels enabled on real multi-chip meshes).
    mesh_dp = build_mesh(MeshConfig(), devices=devices)
    state2 = create_train_state(model, variables2, make_optimizer(cfg))
    state2, shardings2 = shard_train_state(state2, mesh_dp)
    B2 = max(2, n_devices)
    batch2 = {k: (np.repeat(np.asarray(v), -(-B2 // v.shape[0]),
                            axis=0)[:B2])
              for k, v in batch.items()}
    step2 = make_pretrain_step(model, seq2seq=False, mesh=mesh_dp,
                               state_shardings=shardings2)
    state2, metrics2 = step2(state2, step2.shard_batch(batch2),
                             jax.random.PRNGKey(1))
    loss2 = float(metrics2["loss"])
    assert np.isfinite(loss2), f"non-finite shard_map loss {loss2}"
    assert int(state2.step) == 1
