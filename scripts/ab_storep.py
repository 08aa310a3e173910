"""Step-level A/B for the stored-p backward (MVLT_STOREP), including
the round-5 shift-folded SW-MSA branch: chained full pretrain steps
(f+b+AdamW), floor-subtracted, storep OFF vs ON.

Round-4 history: W-MSA-only storep measured NET NEGATIVE at b32
(72.1 -> 75.2 ms) — 9 blocks x ~14 MB of live softmax residuals
between forward and backward out-cost the recompute they avoid.  The
SW-MSA branch doubles the per-block kernel win AND doubles the live
residual footprint; this script records which effect wins.

Usage: python scripts/ab_storep.py   (set ITERS to override)
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def run_one(storep: str) -> None:
    env = dict(os.environ, MVLT_STOREP=storep)
    env.setdefault("ITERS", "20")
    code = r"""
import os, sys, time, dataclasses
sys.path.insert(0, %r)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(%r, ".jax_cache"))
import jax, jax.numpy as jnp, numpy as np
from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
from mvlt_tpu.models.heads import PretrainModel
from mvlt_tpu.train import create_train_state, make_optimizer

B, L = 32, 80
ITERS = int(os.environ.get("ITERS", "20"))
cfg = dataclasses.replace(flagship_vqa_config(), itm_task=True,
                          max_length=80)
model = PretrainModel(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
image = jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32)
cap = jnp.asarray(rng.integers(1, 30000, (B, L)), jnp.int32)
lab = jnp.asarray(np.where(rng.random((B, L)) < 0.15,
                           rng.integers(1, 30000, (B, L)), -100), jnp.int32)
itm = jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32)
variables = zeros_init(model, image, cap, lab, itm)
key = jax.random.key(0, impl="rbg")

j = jax.jit(lambda x: (x * 1.000001).sum())
x0 = jnp.zeros((8, 128), jnp.float32)
float(jax.device_get(j(x0)))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(jax.device_get(j(x0)))
    ts.append(time.perf_counter() - t0)
floor = min(ts)


def full_loss(p, extra, rng):
    vs = {"params": p, **extra}
    loss, metrics = model.apply(vs, image, cap, lab, itm, seq2seq=False,
                                deterministic=False, rngs={"dropout": rng})
    return loss, metrics


state = create_train_state(model, jax.tree.map(jnp.array, variables),
                           make_optimizer(cfg))


def chained(st, key):
    def body(s, _):
        r = jax.random.fold_in(key, s.step)
        (l, _), grads = jax.value_and_grad(full_loss, has_aux=True)(
            s.params, s.extra_variables, r)
        return s.apply_gradients(grads), l
    _, losses = jax.lax.scan(body, st, None, length=ITERS)
    return losses


cj = jax.jit(chained)
float(jax.device_get(cj(state, key)[-1]))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    float(jax.device_get(cj(state, key)[-1]))
    best = min(best, time.perf_counter() - t0)
ms = (best - floor) / ITERS * 1e3
print("storep=%%s step %%6.2f ms  (%%5.1f samples/s)"
      %% (os.environ.get("MVLT_STOREP"), ms, 32e3 / ms), flush=True)
""" % (ROOT, ROOT)
    subprocess.run([sys.executable, "-c", code], env=env, check=True)


if __name__ == "__main__":
    for v in ("0", "1"):
        run_one(v)
