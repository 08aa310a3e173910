"""threefry vs rbg dropout-mask generation cost (the flagship pretrain
step's per-layer mask bill, b32 L=80)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, L, H, nH = 32, 80, 768, 12
ITERS = 20


def bill(key):
    tot = jnp.float32(0)
    for i in range(12):
        k1 = jax.random.fold_in(key, i)
        a = jax.random.bernoulli(k1, 0.9, (B, nH, L, L))
        h1 = jax.random.bernoulli(jax.random.fold_in(k1, 1), 0.9, (B, L, H))
        h2 = jax.random.bernoulli(jax.random.fold_in(k1, 2), 0.9, (B, L, H))
        tot += a.sum().astype(jnp.float32) + h1.sum() + h2.sum()
    return tot * 1e-9


def timeit(fn, key):
    def loop(key):
        def body(c, i):
            v = fn(jax.random.fold_in(key, i))
            return c + v * 1e-12, v
        _, m = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(ITERS, dtype=jnp.uint32))
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(key)))
    t0 = time.perf_counter()
    float(jax.device_get(j(key)))
    return (time.perf_counter() - t0) / ITERS * 1e3


print(f"threefry: {timeit(bill, jax.random.PRNGKey(0)):6.2f} ms")
print(f"rbg:      {timeit(bill, jax.random.key(0, impl='rbg')):6.2f} ms")
