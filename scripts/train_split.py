"""fwd-vs-bwd time split of the flagship pretrain step (b32, bf16)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

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


def loss_fn(p, det):
    out = model.apply({"params": p}, image, cap, lab, itm,
                      deterministic=det, seq2seq=False,
                      rngs=None if det else {"dropout": key,
                                             "drop_path": key})
    loss = out[0] if isinstance(out, tuple) else out
    return loss.astype(jnp.float32)


def timeit(fn):
    def loop(p):
        def body(c, _):
            # perturb params per iteration so XLA cannot hoist the whole
            # loss computation out of the scan as loop-invariant
            p2 = jax.tree.map(lambda x: x * (1 + c * 1e-12).astype(x.dtype),
                              p)
            v = fn(p2)
            return c + v * 1e-12, v
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(params)))
    t0 = time.perf_counter()
    float(jax.device_get(j(params)))
    return (time.perf_counter() - t0) / ITERS


print(f"fwd deterministic: {timeit(lambda p: loss_fn(p, True))*1e3:.1f} ms")
print(f"fwd training-mode: {timeit(lambda p: loss_fn(p, False))*1e3:.1f} ms")
gfn = jax.grad(lambda p: loss_fn(p, False))
print("fwd+bwd training:  {:.1f} ms".format(timeit(
    lambda p: jax.tree_util.tree_reduce(
        lambda a, b: a + b.sum().astype(jnp.float32), gfn(p),
        jnp.float32(0))) * 1e3))
