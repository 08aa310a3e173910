"""Micro-profile the fusion-encoder stored-backward halves at flagship
pretrain geometry (b32, S=129, C=768), plus a CORRECT dropout-mask bill
(per-iteration fold_in so XLA cannot hoist the bernoulli out of the
timing loop)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mvlt_tpu.ops.pallas_attn as pa

ITERS = 30
B, S, C, nH = 32, 129, 768, 12
Dh = C // nH
scale = Dh ** -0.5


def measure_floor():
    x = jnp.ones((8, 128), jnp.bfloat16)
    def loop(x):
        def body(c, _):
            o = c * 2.0
            return o, o.reshape(-1)[0]
        _, m = jax.lax.scan(body, x, None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(x)))
    t0 = time.perf_counter()
    float(jax.device_get(j(x)))
    return time.perf_counter() - t0


FLOOR = measure_floor()
print(f"floor: {FLOOR*1e3/ITERS:.2f} ms/iter-equiv", flush=True)


def timeit(fn, *args):
    def loop(*args):
        def body(c, _):
            a2 = tuple(jax.tree.map(
                lambda t: (t * (1 + c * 1e-12).astype(t.dtype)
                           if jnp.issubdtype(t.dtype, jnp.floating) else t), a)
                for a in args)
            v = fn(*a2)
            return c + v * 1e-12, v
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(*args)))
    t0 = time.perf_counter()
    float(jax.device_get(j(*args)))
    return ((time.perf_counter() - t0) - FLOOR) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, S, C)) * 0.02, dt)
    g = jnp.asarray(rng.normal(size=(B, S, C)), dt)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.02, dt)
    bqkv = jnp.zeros((3 * C,), dt)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.02, dt)
    bproj = jnp.zeros((C,), dt)
    kbias = jnp.zeros((B, S), jnp.float32)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.02, dt)
    b1 = jnp.zeros((4 * C,), dt)
    w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.02, dt)
    b2 = jnp.zeros((C,), dt)

    def attn_fb(x, wqkv, bqkv, wproj, bproj, kbias, lns, lnb):
        def f(*a):
            return pa.fused_attn_ln(*a, scale, nH, 1e-12, 8, False) \
                .astype(jnp.float32).mean()
        l, gr = jax.value_and_grad(f, argnums=tuple(range(8)))(
            x, wqkv, bqkv, wproj, bproj, kbias, lns, lnb)
        return l + sum(jnp.sum(t).astype(jnp.float32) * 1e-12
                       for t in jax.tree.leaves(gr))

    def attn_f(x, wqkv, bqkv, wproj, bproj, kbias, lns, lnb):
        return pa.fused_attn_ln(x, wqkv, bqkv, wproj, bproj, kbias, lns,
                                lnb, scale, nH, 1e-12, 8, False) \
            .astype(jnp.float32).mean()

    def mlp_fb(x, w1, b1, w2, b2, lns, lnb):
        def f(*a):
            return pa.fused_mlp_ln(*a, 1e-12, 256, False) \
                .astype(jnp.float32).mean()
        l, gr = jax.value_and_grad(f, argnums=tuple(range(7)))(
            x, w1, b1, w2, b2, lns, lnb)
        return l + sum(jnp.sum(t).astype(jnp.float32) * 1e-12
                       for t in jax.tree.leaves(gr))

    def mlp_f(x, w1, b1, w2, b2, lns, lnb):
        return pa.fused_mlp_ln(x, w1, b1, w2, b2, lns, lnb, 1e-12, 256, False) \
            .astype(jnp.float32).mean()

    ta_f = timeit(attn_f, x, wqkv, bqkv, wproj, bproj, kbias, lns, lnb)
    ta = timeit(attn_fb, x, wqkv, bqkv, wproj, bproj, kbias, lns, lnb)
    tm_f = timeit(mlp_f, x, w1, b1, w2, b2, lns, lnb)
    tm = timeit(mlp_fb, x, w1, b1, w2, b2, lns, lnb)
    print(f"attn half: fwd {ta_f:6.3f}  f+b {ta:6.3f}   (x12 = "
          f"{12*ta:5.1f})", flush=True)
    print(f"mlp  half: fwd {tm_f:6.3f}  f+b {tm:6.3f}   (x12 = "
          f"{12*tm:5.1f})", flush=True)

    # correct mask bill: fold_in a fresh step index each iteration
    for impl in ("rbg", "threefry2x32"):
        key = (jax.random.key(0, impl=impl) if impl == "rbg"
               else jax.random.PRNGKey(0))
        def masks(c, key):
            k = jax.random.fold_in(key, c.astype(jnp.int32))
            tot = jnp.float32(0)
            for i in range(12):
                k1 = jax.random.fold_in(k, 2 * i)
                k2 = jax.random.fold_in(k, 2 * i + 1)
                am = jax.random.bernoulli(k1, 0.9, (B, nH, S, S))
                hm = jax.random.bernoulli(k2, 0.9, (B, S, C))
                tot = tot + am.sum() * 1e-9 + hm.sum() * 1e-9
            return tot
        def loop(key):
            def body(c, _):
                v = masks(c, key)
                return c + 1 + v * 1e-12, v
            _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return m.sum()
        j = jax.jit(loop)
        float(jax.device_get(j(key)))
        t0 = time.perf_counter()
        float(jax.device_get(j(key)))
        t = ((time.perf_counter() - t0) - FLOOR) / ITERS * 1e3
        print(f"mask gen 12 layers ({impl}): {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
