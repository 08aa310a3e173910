"""True in-step optimizer cost, chained-steps harness (floor-free).

Variants: full AdamW (production), near-free SGD (keeps the whole
f+b graph alive, removes the optimizer state traffic/math), and
AdamW with bf16 first moment.
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
from mvlt_tpu.models.heads import PretrainModel
from mvlt_tpu.train import create_train_state, make_optimizer

BATCH = int(os.environ.get("B", "32"))
ITERS = int(os.environ.get("ITERS", "20"))

cfg = dataclasses.replace(flagship_vqa_config(), itm_task=True, max_length=80)
model = PretrainModel(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
b = {"image": jnp.asarray(rng.normal(size=(BATCH, 3, 224, 224)), jnp.float32),
     "caption_masked": jnp.asarray(rng.integers(1, 30000, (BATCH, 80)),
                                   jnp.int32),
     "caption_label": jnp.asarray(
         np.where(rng.random((BATCH, 80)) < 0.15,
                  rng.integers(1, 30000, (BATCH, 80)), -100), jnp.int32),
     "itm_label": jnp.asarray(rng.integers(0, 2, (BATCH,)), jnp.int32)}
variables = zeros_init(model, b["image"], b["caption_masked"],
                       b["caption_label"], b["itm_label"])
key = jax.random.key(0, impl="rbg")


def loss_fn(params, extra, batch, rng):
    vs = {"params": params, **extra}
    loss, metrics = model.apply(vs, batch["image"], batch["caption_masked"],
                                batch["caption_label"],
                                batch.get("itm_label"), seq2seq=False,
                                deterministic=False, rngs={"dropout": rng})
    return loss, metrics


def run(tag, tx):
    state = create_train_state(model, jax.tree.map(jnp.array, variables), tx)

    def one_step(st, batch, rng):
        rng = jax.random.fold_in(rng, st.step)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params, st.extra_variables, batch, rng)
        return st.apply_gradients(grads), loss

    def chained(st, batch, key):
        def body(s, _):
            s2, loss = one_step(s, batch, key)
            return s2, loss
        _, losses = jax.lax.scan(body, st, None, length=ITERS)
        return losses

    cj = jax.jit(chained)
    float(jax.device_get(cj(state, b, key)[-1]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.device_get(cj(state, b, key)[-1]))
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    print(f"{tag:24s} {ms:6.2f} ms/step  {BATCH / ms * 1e3:6.1f} samples/s",
          flush=True)
    return ms


run("adamw f32 (production)", make_optimizer(cfg))
run("sgd 1e-12 (floor)", optax.sgd(1e-12))
run("adamw bf16 mu",
    optax.adamw(cfg.lr, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
                weight_decay=cfg.weight_decay, mu_dtype=jnp.bfloat16))
