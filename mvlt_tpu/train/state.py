"""Train state + optimizer.

Optimizer parity with the reference: ``AdamW(lr=config.lr, betas=(0.9,
0.999), eps=1e-6, weight_decay=1e-4)`` (``run_vqa.py:85``,
``run_pretrain.py:169``, ``run_retrieval.py:158``; no LR scheduler, no grad
clip in the reference loops).  Schedules/clipping are available as opt-in
knobs the reference lacked.

Unlike the reference — which never saves optimizer state (SURVEY.md §5) —
the state here is one pytree, checkpointable wholesale via
``mvlt_tpu.utils.checkpoint``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import optax
from flax import struct

from mvlt_tpu.config import MVLTConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    extra_variables: Any  # batch_stats etc. (ResNet/linear-patch BN)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_optimizer(config: MVLTConfig,
                   schedule: Optional[optax.Schedule] = None,
                   grad_clip_norm: Optional[float] = None,
                   grad_accum_steps: int = 1) -> optax.GradientTransformation:
    lr = schedule if schedule is not None else config.lr
    tx = optax.adamw(lr, b1=config.adam_b1, b2=config.adam_b2,
                     eps=config.adam_eps, weight_decay=config.weight_decay,
                     mu_dtype=jnp.dtype(config.adam_mu_dtype))
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, grad_accum_steps)
    return tx


def create_train_state(model, variables, tx) -> TrainState:
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), extra_variables=extra,
                      tx=tx, apply_fn=model.apply)
