"""Isolate the optimizer-update cost inside the flagship pretrain step:
full step (fwd+bwd+AdamW) vs fwd+bwd-only, plus a standalone AdamW-update
sweep over the real param tree (b32, bf16 model, f32 optimizer).

Timing: chained iterations inside one jit; host fetch (axon returns from
block_until_ready early); floor NOT subtracted — deltas between lines are
the signal."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
from mvlt_tpu.models.heads import PretrainModel

ITERS = 20
cfg = dataclasses.replace(flagship_vqa_config(), itm_task=True, max_length=80)
model = PretrainModel(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
B, L = 32, 80
image = jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32)
cap = jnp.asarray(rng.integers(1, 30000, (B, L)), jnp.int32)
lab = jnp.asarray(np.where(rng.random((B, L)) < 0.15,
                           rng.integers(1, 30000, (B, L)), -100), jnp.int32)
itm = jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32)
variables = zeros_init(model, image, cap, lab, itm)
params = variables["params"]
key = jax.random.PRNGKey(0)

nparams = sum(x.size for x in jax.tree.leaves(params))
print(f"param count: {nparams/1e6:.1f}M")

tx = optax.adamw(1e-4, b1=0.9, b2=0.999, eps=1e-6, weight_decay=1e-4)
opt_state = jax.jit(tx.init)(params)


def loss_fn(p):
    out = model.apply({"params": p}, image, cap, lab, itm,
                      deterministic=False, seq2seq=False,
                      rngs={"dropout": key, "drop_path": key})
    return (out[0] if isinstance(out, tuple) else out).astype(jnp.float32)


def time_loop(j, *a):
    r = jax.device_get(j(*a))
    t0 = time.perf_counter()
    r = jax.device_get(j(*a))
    del r
    return (time.perf_counter() - t0) / ITERS * 1e3


# 1. fwd+bwd only (grad reduced to a scalar so no param-tree output)
def fb_loop(p):
    def body(c, _):
        p2 = jax.tree.map(lambda x: x * (1 + c * 1e-12).astype(x.dtype), p)
        g = jax.grad(loss_fn)(p2)
        s = jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum().astype(jnp.float32), g, jnp.float32(0))
        return c + s * 1e-12, s
    _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
    return m.sum()


# 2. full step: fwd+bwd+AdamW, params carried through the scan
def step_loop(p, o):
    def body(carry, _):
        p, o = carry
        g = jax.grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        p = optax.apply_updates(p, up)
        return (p, o), jnp.float32(0)
    (p, o), _ = jax.lax.scan(body, (p, o), None, length=ITERS)
    return jax.tree.leaves(p)[0].sum()


# 3. AdamW update only (synthetic grads = params * 1e-3)
def opt_loop(p, o):
    def body(carry, _):
        p, o = carry
        g = jax.tree.map(lambda x: x.astype(jnp.float32) * 1e-3, p)
        up, o = tx.update(g, o, p)
        p = optax.apply_updates(p, up)
        return (p, o), jnp.float32(0)
    (p, o), _ = jax.lax.scan(body, (p, o), None, length=ITERS)
    return jax.tree.leaves(p)[0].sum()


import sys as _sys
which = _sys.argv[1] if len(_sys.argv) > 1 else "opt"
if which in ("opt", "all"):
    print(f"adamw only   : {time_loop(jax.jit(opt_loop), params, opt_state):7.1f} ms", flush=True)
if which in ("fb", "all"):
    print(f"fwd+bwd only : {time_loop(jax.jit(fb_loop), params):7.1f} ms", flush=True)
if which in ("step", "all"):
    print(f"full step    : {time_loop(jax.jit(step_loop), params, opt_state):7.1f} ms", flush=True)
