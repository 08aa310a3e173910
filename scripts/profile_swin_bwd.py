"""Per-stage fwd vs fwd+bwd timing of Swin-S training blocks (b32, bf16).

Finds where the backward excess sits (the fastcore recompute path)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mvlt_tpu.models.backbones.swin import SwinBlock
from mvlt_tpu.flagship import zeros_init

BATCH = int(os.environ.get("B", "32"))
ITERS = int(os.environ.get("ITERS", "20"))
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)


def timeit(fn, p, x):
    def loop(p, x):
        def body(c, _):
            p2 = jax.tree.map(lambda a: a * (1 + c * 1e-12).astype(a.dtype), p)
            v = fn(p2, x)
            return c + v * 1e-12, v
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(p, x)))
    t0 = time.perf_counter()
    float(jax.device_get(j(p, x)))
    return (time.perf_counter() - t0) / ITERS * 1e3


stages = [
    (0, 96, (56, 56), 3),
    (1, 192, (28, 28), 6),
    (2, 384, (14, 14), 12),
    (3, 768, (7, 7), 24),
]
_only = os.environ.get("STAGES")
if _only:
    keep = {int(s) - 1 for s in _only.split(",")}
    stages = [s for s in stages if s[0] in keep]

for i, dim, res, heads in stages:
    for shift, tag in ((0, "W-MSA "), (3, "SW-MSA")):
        class OneBlock(nn.Module):
            @nn.compact
            def __call__(self, x):
                return SwinBlock(dim=dim, input_resolution=res,
                                 num_heads=heads, window_size=7,
                                 shift_size=shift, drop_path=0.1,
                                 dtype=dt, name="b")(x, False)

        m1 = OneBlock()
        xs = jnp.zeros((BATCH, res[0] * res[1], dim), dt)
        v1 = zeros_init(m1, xs)
        p1 = v1["params"]

        def loss(p, x):
            out = m1.apply({"params": p}, x,
                           rngs={"dropout": key, "drop_path": key})
            return out.astype(jnp.float32).sum() * 1e-6

        def gsum(p, x):
            g = jax.grad(loss)(p, x)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum().astype(jnp.float32), g,
                jnp.float32(0))

        def gsum_x(p, x):
            g = jax.grad(loss, argnums=1)(p, x)
            return g.sum().astype(jnp.float32)

        def gsum_notab(p, x):
            # params grads except the rel-pos table (its scatter-add
            # backward is the suspect)
            def loss2(p2, x):
                p3 = jax.tree_util.tree_map_with_path(
                    lambda kp, a: jax.lax.stop_gradient(a)
                    if "relative_position_bias_table" in str(kp) else a, p2)
                return loss(p3, x)
            g = jax.grad(loss2)(p, x)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum().astype(jnp.float32), g,
                jnp.float32(0))

        f = timeit(loss, p1, xs)
        fb = timeit(gsum, p1, xs)
        fbx = timeit(gsum_x, p1, xs)
        fbn = timeit(gsum_notab, p1, xs)
        print(f"stage {i+1} {tag} ({res[0]}x{res[1]}x{dim}): "
              f"fwd {f:6.2f}  f+b {fb:6.2f}  f+b(dx only) {fbx:6.2f}  "
              f"f+b(no table) {fbn:6.2f}  ratio {fb/f:4.1f}",
              flush=True)
