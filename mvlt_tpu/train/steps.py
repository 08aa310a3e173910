"""Compiled SPMD train steps.

One generic factory (:func:`make_train_step`) + per-task loss adapters
mirroring the reference loops: VQA (``run_vqa.py:77-118``), MLM+ITM
pretraining (``run_pretrain.py:162-194``), retrieval (``run_retrieval.py:
148-189``) and caption training (``run_report_generation_cxr.py:458-493``).

TPU-first: the whole step (fwd + bwd + AdamW update) is one ``jax.jit``
program over the device mesh; DP gradient reduction and TP collectives are
emitted by XLA from the shardings — there is no explicit all-reduce call.
The reference's per-batch Python coin flip between seq2seq/bidirectional
masks (``model.py:390-394``) stays OUTSIDE the compiled step as a static
argument: both variants compile once and the host picks per batch with a
keyed PRNG draw (:func:`seq2seq_coin_flip`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvlt_tpu.parallel.partition import param_shardings
from mvlt_tpu.train.state import TrainState

Batch = Dict[str, jnp.ndarray]


def seq2seq_coin_flip(rng: jax.Array) -> bool:
    """Host-side replacement for the reference's ``random.random() < 0.5``
    (model.py:390-394): keyed, reproducible, loggable."""
    return bool(jax.random.bernoulli(rng, 0.5))


def make_train_step(loss_fn: Callable[[Any, Any, Batch, jax.Array], Any],
                    mesh: Optional[Mesh] = None,
                    state_shardings: Any = None,
                    donate: bool = True,
                    use_shard_map: Optional[bool] = None):
    """Build the compiled step.

    ``loss_fn(params, extra_variables, batch, rng) -> (loss, (metrics,
    new_extra))``.  With a mesh, inputs are constrained to P('data') on the
    leading axis and the state to its param shardings.

    Partitioning strategy (Mosaic kernels cannot be auto-partitioned by
    GSPMD — see ``ops/policy.py``):

    - **data-parallel-only meshes** default to a ``shard_map``-wrapped
      step (params replicated, batch sharded, grads ``pmean``'d over
      'data'): mesh axes are fully manual there, so the Pallas fused
      kernels stay enabled.  ``use_shard_map=False`` forces GSPMD.
    - **tensor-parallel meshes** (model axis > 1) use GSPMD jit with the
      param/activation shardings from ``parallel/partition.py``; the
      kernel gates fall back to XLA formulations for that program.

    NOTE: the state argument is DONATED (buffers reused in place). On CPU
    backends ``shard_train_state``'s device_put can alias the original
    ``variables`` pytree, so treat those arrays as consumed after the
    first step (copy with ``jax.tree.map(jnp.array, ...)`` if you need
    them again — e.g. to build a second state).
    """

    def step(state: TrainState, batch: Batch, rng: jax.Array):
        from mvlt_tpu.ops import policy
        with policy.gspmd_tracing(mesh is not None and mesh.size > 1):
            rng = jax.random.fold_in(rng, state.step)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (metrics, new_extra)), grads = grad_fn(
                state.params, state.extra_variables, batch, rng)
            state = state.apply_gradients(grads)
            if new_extra:
                state = state.replace(extra_variables=new_extra)
            metrics = dict(metrics)
            metrics.setdefault("loss", loss)
            return state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    dp = mesh.shape.get("data", 1)
    dp_only = mesh.size > 1 and dp == mesh.size
    if use_shard_map is None:
        use_shard_map = dp_only

    def _validate(batch: Batch) -> Batch:
        import numpy as np
        out = {}
        for k, v in batch.items():
            if not (hasattr(v, "shape") or np.isscalar(v)):
                continue  # drop string/list fields
            if hasattr(v, "shape") and v.ndim and v.shape[0] % dp != 0:
                raise ValueError(
                    f"batch['{k}'] leading dim {v.shape[0]} not divisible by "
                    f"data-parallel size {dp}; pick batch_size as a multiple")
            out[k] = v
        return out

    def shard_batch(batch: Batch) -> Batch:
        return jax.tree.map(lambda x: jax.device_put(x, data),
                            _validate(batch))

    def prefetch(iterator, size: int = 2, threads: int = 1):
        """Wrap a host batch iterator with device prefetch (copies overlap
        the previous step's compute).  ``threads > 1`` pipelines the
        host->device transfers themselves (order preserved)."""
        from mvlt_tpu.data.loader import device_prefetch
        return device_prefetch(iterator, size=size, sharding=data,
                               transform=_validate, threads=threads)

    if use_shard_map and dp_only:
        # manual DP: every mesh axis is manual inside, so Mosaic kernels
        # are legal. Params/opt-state replicated; identical pmean'd grads
        # keep the replicas in lockstep (same contract as GSPMD DP).
        from jax import shard_map

        import inspect
        accepts_axis = "axis_name" in inspect.signature(loss_fn).parameters

        def local_step(state: TrainState, batch: Batch, rng: jax.Array):
            rng = jax.random.fold_in(rng, state.step)
            # decorrelate dropout across DP shards (GSPMD draws one
            # global mask; manual shards each draw their own)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

            # Make the LOSS global before grad (not the grads after):
            # under shard_map's typed axis-variance semantics,
            # d(unvarying loss)/d(replicated params) comes back psum'd
            # across shards by the broadcast transpose with the global
            # normalization folded in.  Axis-aware loss_fns (the task
            # adapters) psum their own NLL sums AND valid-label counts,
            # so ignore-index losses normalize by the GLOBAL count —
            # bit-matching GSPMD even when shards carry different
            # numbers of valid labels.  Plain loss_fns (uniform
            # per-shard weights) are pmean'd.
            def local_loss(params, extra, batch, rng):
                if accepts_axis:
                    return loss_fn(params, extra, batch, rng,
                                   axis_name="data")
                loss, aux = loss_fn(params, extra, batch, rng)
                return jax.lax.pmean(loss, "data"), aux

            grad_fn = jax.value_and_grad(local_loss, has_aux=True)
            (loss, (metrics, new_extra)), grads = grad_fn(
                state.params, state.extra_variables, batch, rng)
            state = state.apply_gradients(grads)
            if new_extra:
                state = state.replace(
                    extra_variables=jax.lax.pmean(new_extra, "data"))
            metrics = {k: jax.lax.pmean(v, "data")
                       for k, v in dict(metrics).items()}
            metrics.setdefault("loss", loss)
            return state, metrics

        sm = shard_map(local_step, mesh=mesh,
                       in_specs=(P(), P("data"), P()),
                       out_specs=(P(), P()))
        jitted = jax.jit(sm, donate_argnums=(0,) if donate else ())
    else:
        jitted = jax.jit(
            step,
            in_shardings=(state_shardings, data, repl),
            # pin the output state to the same layout so step N+1's input
            # contract holds (XLA would otherwise pick its own shardings)
            out_shardings=(state_shardings, repl),
            donate_argnums=(0,) if donate else (),
        )
    jitted.shard_batch = shard_batch
    jitted.prefetch = prefetch
    return jitted


def shard_train_state(state: TrainState, mesh: Mesh) -> tuple:
    """Place a TrainState on the mesh; returns (sharded_state, shardings)."""
    p_shard = param_shardings(state.params, mesh)
    opt_shard = _mirror_opt_shardings(state.opt_state, state.params,
                                      p_shard, mesh)
    extra_shard = jax.tree.map(lambda _: NamedSharding(mesh, P()),
                               state.extra_variables)
    shardings = state.replace(
        step=NamedSharding(mesh, P()), params=p_shard,
        opt_state=opt_shard, extra_variables=extra_shard)
    sharded = jax.tree.map(lambda x, s: jax.device_put(x, s), state, shardings)
    return sharded, shardings


def _mirror_opt_shardings(opt_state, params, p_shard, mesh):
    """Adam mu/nu live in pytrees structured like params — reuse the param
    shardings for any such subtree; everything else (step counts) replicates."""
    pstruct = jax.tree_util.tree_structure(params)
    repl = NamedSharding(mesh, P())

    def is_param_tree(node):
        try:
            return jax.tree_util.tree_structure(node) == pstruct
        except Exception:
            return False

    return jax.tree.map(lambda n: p_shard if is_param_tree(n) else repl,
                        opt_state, is_leaf=is_param_tree)


# ---------------------------------------------------------------------------
# per-task loss adapters
# ---------------------------------------------------------------------------

def _bn_backbone(model) -> Optional[bool]:
    """BatchNorm backbones (linear patch, ResNet) must train under GSPMD:
    the shard_map DP path would compute BN moments over the per-shard
    local batch (batch/dp samples) instead of the global batch.  Returns
    False (force GSPMD) for those, None (auto) otherwise."""
    conv = str(getattr(getattr(model, "config", None), "conv", "")).lower()
    return False if conv in ("linear", "resnet50", "resnet101") else None


def _apply(model, params, extra, rng, *args, train: bool = True, **kw):
    variables = {"params": params, **extra}
    mutable = [k for k in extra.keys() if k == "batch_stats"] if train else []
    rngs = {"dropout": rng} if train else {}
    if mutable:
        out, mut = model.apply(variables, *args, deterministic=not train,
                               rngs=rngs, mutable=mutable, **kw)
        new_extra = {**extra, **mut}
    else:
        out = model.apply(variables, *args, deterministic=not train,
                          rngs=rngs, **kw)
        new_extra = {}
    return out, new_extra


def make_vqa_step(model, mesh=None, state_shardings=None):
    """CE over answer logits (run_vqa.py:105)."""

    def loss_fn(params, extra, batch, rng, axis_name=None):
        (loss, logits), new_extra = _apply(
            model, params, extra, rng, batch["image"], batch["question"],
            batch["label"], method=model.loss, axis_name=axis_name)
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(
            jnp.float32))
        return loss, ({"accuracy": acc}, new_extra)

    return make_train_step(loss_fn, mesh, state_shardings,
                           use_shard_map=_bn_backbone(model))


def make_pretrain_step(model, seq2seq: bool, mesh=None, state_shardings=None):
    """MLM (+ITM) summed loss (model.py:410-420); one compiled program per
    mask mode."""

    def loss_fn(params, extra, batch, rng, axis_name=None):
        (loss, metrics), new_extra = _apply(
            model, params, extra, rng, batch["image"],
            batch["caption_masked"], batch["caption_label"],
            batch.get("itm_label"), seq2seq=seq2seq, axis_name=axis_name)
        return loss, (metrics, new_extra)

    return make_train_step(loss_fn, mesh, state_shardings,
                           use_shard_map=_bn_backbone(model))


def make_retrieval_step(model, mesh=None, state_shardings=None):
    """CE over match logits; batch already = concat(pos, neg)
    (run_retrieval.py:162-177)."""

    def loss_fn(params, extra, batch, rng, axis_name=None):
        (loss, logits), new_extra = _apply(
            model, params, extra, rng, batch["image"], batch["caption"],
            batch["label"], method=model.loss, axis_name=axis_name)
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(
            jnp.float32))
        return loss, ({"accuracy": acc}, new_extra)

    return make_train_step(loss_fn, mesh, state_shardings,
                           use_shard_map=_bn_backbone(model))


def make_caption_step(model, learning_strategy: str = "unilm", mesh=None,
                      state_shardings=None):
    """CE over MLM logits ignore -100 (run_report_generation_cxr.py:471)."""

    def loss_fn(params, extra, batch, rng, axis_name=None):
        (loss, _), new_extra = _apply(
            model, params, extra, rng, batch["image"], batch["caption"],
            batch["mlm_labels"], learning_strategy=learning_strategy,
            method=model.loss, axis_name=axis_name)
        return loss, ({}, new_extra)

    return make_train_step(loss_fn, mesh, state_shardings,
                           use_shard_map=_bn_backbone(model))
