"""Shared task plumbing: mesh + state construction, epoch loops,
checkpointing, metric logging.

This is the layer the reference hand-rolled separately in every
``run_*.py`` (SURVEY.md §1 L6); here it is one runner with per-task hooks.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.config import MVLTConfig, TrainConfig
from mvlt_tpu.parallel import build_mesh
from mvlt_tpu.train import (create_train_state, make_optimizer,
                            shard_train_state)
from mvlt_tpu.utils import checkpoint as ckpt_lib
from mvlt_tpu.utils.logging import MetricLogger, setup_logger


def device_batch(batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """numpy batch -> device arrays (drops non-array fields)."""
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray) or np.isscalar(v)}


def train_rng(tc: TrainConfig, offset: int = 0) -> jax.Array:
    """Training rng keyed by ``tc.seed`` using ``tc.rng_impl``.

    ``rng_impl='rbg'`` (default) maps dropout-mask generation onto the TPU
    hardware RNG — roughly half the per-step mask cost of threefry at
    flagship shapes (see :class:`mvlt_tpu.config.TrainConfig`)."""
    impl = getattr(tc, "rng_impl", "threefry2x32")
    if impl in ("threefry", "threefry2x32", None):
        return jax.random.PRNGKey(tc.seed + offset)
    return jax.random.key(tc.seed + offset, impl=impl)


class TaskRunner:
    """Owns mesh, model state, step functions, checkpoints, logging."""

    def __init__(self, model, config: MVLTConfig,
                 train_config: TrainConfig = TrainConfig(),
                 workdir: Optional[str] = None, name: str = "mvlt"):
        self.model = model
        self.config = config
        self.train_config = train_config
        self.workdir = workdir
        self.logger = setup_logger(name, workdir,
                                   distributed_rank=jax.process_index())
        self.metrics = MetricLogger(workdir if jax.process_index() == 0
                                    else None)
        self.mesh = build_mesh(train_config.mesh)
        self.state = None
        self.shardings = None
        self._compiled: Dict[Any, Any] = {}
        self._host_step = None          # synced lazily from state.step
        self._window_samples = 0

    def compiled(self, key, factory):
        """Process-lifetime cache for jitted eval/decode functions.

        Defining ``@jax.jit`` closures inside an eval function creates a
        fresh function object (and jit cache) per call, so per-epoch
        validation re-traces and re-compiles every epoch — minutes per
        compile at flagship scale.  Cache the jitted callable by a
        semantic key instead; jax's own cache then handles shape/dtype
        specialization within it."""
        fn = self._compiled.get(key)
        if fn is None:
            raw = factory()
            mesh = self.mesh

            def traced(*a, **k):
                # eval programs over a multi-device mesh are GSPMD-
                # partitioned (params live sharded/replicated across the
                # mesh) — Mosaic kernels cannot be auto-partitioned
                # there, so flag the trace to route the kernel gates to
                # XLA (ops/policy.py); single-device meshes keep kernels.
                from mvlt_tpu.ops import policy
                with policy.gspmd_tracing(mesh is not None
                                          and mesh.size > 1):
                    return raw(*a, **k)

            fn = self._compiled[key] = jax.jit(traced)
        return fn

    def init_state(self, example_batch_args: tuple,
                   pretrained_variables: Optional[Any] = None,
                   rng: Optional[jax.Array] = None):
        """``pretrained_variables`` may be one variables tree or a list
        of (possibly partial) trees merged in order — e.g. a pretrain
        export followed by an official backbone checkpoint
        (``--backbone_ckpt``, reference ``modules/model.py:222-226``)."""
        rng = rng if rng is not None else jax.random.PRNGKey(
            self.train_config.seed)
        variables = self.model.init(rng, *example_batch_args)
        if pretrained_variables is not None:
            trees = pretrained_variables if isinstance(
                pretrained_variables, (list, tuple)) else [pretrained_variables]
            for tree in trees:
                variables = _merge_pretrained(variables, tree, self.logger)
        tx = make_optimizer(self.config,
                            grad_accum_steps=self.train_config.grad_accum_steps)
        state = create_train_state(self.model, variables, tx)
        self.state, self.shardings = shard_train_state(state, self.mesh)
        return self.state

    def maybe_restore(self) -> bool:
        if not self.workdir:
            return False
        self.state, ok = ckpt_lib.restore_checkpoint(self.workdir, self.state)
        if ok:
            self._host_step = None      # resync the host counter
            self.logger.info("restored checkpoint at step %d",
                             int(self.state.step))
        return ok

    def save(self, keep: int = 3) -> None:
        # ALL processes must enter the save: orbax's sharded-array write
        # is a collective (each host writes its addressable shards;
        # gating on process 0 would deadlock multi-host runs and cannot
        # serialize non-addressable shards)
        if self.workdir:
            ckpt_lib.save_checkpoint(
                self.workdir, self.state, keep=keep,
                async_save=self.train_config.async_checkpoint)

    def finish(self) -> None:
        """Block until any in-flight async checkpoint save is committed —
        call at the end of a train loop before the process may exit."""
        ckpt_lib.wait_for_async_saves()

    def log_step(self, metrics: Dict, samples: int) -> None:
        # Host-side step counter: `int(self.state.step)` (or float() on a
        # device metric) blocks until the just-dispatched step finishes,
        # which would serialize host dispatch with device compute on
        # EVERY step. Metrics are only fetched on log_every boundaries,
        # with step time averaged over the whole window.
        if self._host_step is None:
            self._host_step = int(self.state.step)
        else:
            self._host_step += 1
        step = self._host_step
        self._window_samples += samples
        every = max(1, self.train_config.log_every)
        if step % every != 0:
            return
        out = self.metrics.step(step, metrics, self._window_samples)
        self._window_samples = 0
        parts = " ".join(f"{k}={v:.4f}" for k, v in out.items()
                         if k != "step")
        self.logger.info("step %d: %s", step, parts)


def _merge_pretrained(variables, pretrained, logger):
    """Copy matching subtrees from a pretrained export into freshly
    initialized variables (HF from_pretrained semantics: missing keys stay
    initialized, unexpected keys are dropped)."""
    flat_init = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    flat_pre = dict(jax.tree_util.tree_flatten_with_path(pretrained)[0])
    used = 0
    out = {}
    for path, leaf in flat_init.items():
        if path in flat_pre and flat_pre[path].shape == leaf.shape:
            out[path] = jnp.asarray(flat_pre[path], leaf.dtype)
            used += 1
        else:
            out[path] = leaf
    logger.info("loaded %d/%d pretrained tensors", used, len(flat_init))
    treedef = jax.tree_util.tree_structure(variables)
    leaves = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(
        variables)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves)
