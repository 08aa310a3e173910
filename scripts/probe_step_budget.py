"""Full-step budget with ONE consistent chained harness (floor-subtracted):

  step      : full production train step (f+b+AdamW)
  sgd       : same with near-free SGD (isolates the optimizer)
  fusion+hd : text embeds + fusion encoder + MLM/ITM heads + CE f+b
              (image features fixed)
  swin      : Swin backbone f+b alone (on pre-normalized NHWC input)
  adapter   : image normalize + backbone + projection f+b (full conv())

misc = sgd - fusion+hd - adapter.
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

B, L = 32, 80
ITERS = int(os.environ.get("ITERS", "20"))

cfg = dataclasses.replace(flagship_vqa_config(), itm_task=True, max_length=80)
model = PretrainModel(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
image = jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32)
cap = jnp.asarray(rng.integers(1, 30000, (B, L)), jnp.int32)
lab = jnp.asarray(np.where(rng.random((B, L)) < 0.15,
                           rng.integers(1, 30000, (B, L)), -100), jnp.int32)
itm = jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32)
variables = zeros_init(model, image, cap, lab, itm)
params = variables["params"]
key = jax.random.key(0, impl="rbg")


def measure_floor():
    j = jax.jit(lambda x: (x * 1.000001).sum())
    x = jnp.zeros((8, 128), jnp.float32)
    float(jax.device_get(j(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(j(x)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


FLOOR = measure_floor()


def timeit_state(tx, loss):
    state = create_train_state(model, jax.tree.map(jnp.array, variables), tx)

    def chained(st, key):
        def body(s, _):
            rng = jax.random.fold_in(key, s.step)
            (l, _), grads = jax.value_and_grad(loss, has_aux=True)(
                s.params, s.extra_variables, rng)
            return s.apply_gradients(grads), l
        _, losses = jax.lax.scan(body, st, None, length=ITERS)
        return losses
    cj = jax.jit(chained)
    float(jax.device_get(cj(state, key)[-1]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.device_get(cj(state, key)[-1]))
        best = min(best, time.perf_counter() - t0)
    return (best - FLOOR) / ITERS * 1e3


def timeit_grad(loss, p):
    def chained(p, key):
        def body(c, _):
            p2 = jax.tree.map(lambda a: a * (1 + c * 1e-12).astype(a.dtype),
                              p)
            g = jax.grad(loss)(p2, jax.random.fold_in(key, c.astype(
                jnp.int32)))
            s = jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum().astype(jnp.float32), g,
                jnp.float32(0))
            return c + s * 1e-12, s
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    cj = jax.jit(chained)
    float(jax.device_get(cj(p, key)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.device_get(cj(p, key)))
        best = min(best, time.perf_counter() - t0)
    return (best - FLOOR) / ITERS * 1e3


def full_loss(p, extra, rng):
    vs = {"params": p, **extra}
    loss, metrics = model.apply(vs, image, cap, lab, itm, seq2seq=False,
                                deterministic=False, rngs={"dropout": rng})
    return loss, metrics


t_step = timeit_state(make_optimizer(cfg), full_loss)
print(f"step (adamw)     : {t_step:6.2f} ms", flush=True)
t_sgd = timeit_state(optax.sgd(1e-12), full_loss)
print(f"step (sgd floor) : {t_sgd:6.2f} ms   -> optimizer "
      f"{t_step - t_sgd:5.2f}", flush=True)

# image features fixed -> fusion side only
feat = jax.jit(lambda: jax.lax.stop_gradient(model.apply(
    {"params": params}, image, True,
    method=lambda m, im, d: m.conv(im, d))))()
fusion_params = {k: v for k, v in params.items() if k != "conv"}


from mvlt_tpu.models.heads import (cross_entropy_ignore_index,
                                   gather_label_positions)


def fusion_loss(p, rng):
    pf = {**p, "conv": params["conv"]}

    def run(m, ft):
        text_mask = cap > 0
        image_mask = jnp.ones(ft.shape[:2], bool)
        out = m.fusion(cap, text_mask, ft, image_mask, seq2seq_mask=False,
                       deterministic=False)
        text_out, mlm_label = gather_label_positions(
            out.text_output(), lab, cfg.mlm_gather_k)
        mlm_logits = m.mlm_head_bidir(text_out)
        loss = cross_entropy_ignore_index(mlm_logits, mlm_label)
        itm_logits = m.itm_mlp(out.pooled)
        return loss + cross_entropy_ignore_index(itm_logits, itm)

    return model.apply({"params": pf}, feat, method=run,
                       rngs={"dropout": rng}).astype(jnp.float32)


try:
    t_fus = timeit_grad(fusion_loss, fusion_params)
    print(f"fusion side      : {t_fus:6.2f} ms", flush=True)
except Exception as e:
    print("fusion side probe failed:", str(e)[:200], flush=True)
    t_fus = None


def adapter_loss(p, rng):
    out = model.apply({"params": p}, image, False,
                      rngs={"dropout": rng},
                      method=lambda m, im, d: m.conv(im, d))
    return out.astype(jnp.float32).sum() * 1e-6


t_ad = timeit_grad(adapter_loss, {"conv": params["conv"]})
print(f"adapter (conv f+b): {t_ad:6.2f} ms", flush=True)
if t_fus is not None:
    print(f"misc = sgd - fusion - adapter = "
          f"{t_sgd - t_fus - t_ad:6.2f} ms", flush=True)
