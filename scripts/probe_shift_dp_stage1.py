"""On-chip probe: stage-1 (56x56, C=96) shift-folded kernel WITH
per-image-constant DropPath multipliers, now that the dp permutation
scratches/copies are gone (identity for per-image constants).

Checks (a) Mosaic compiles at 896 runs (the old dp variant blew the
scoped-VMEM accounting at 18.3M), (b) forward parity vs the permuting
fastcore reference, (c) fwd and fwd+bwd timing vs the XLA roll path.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.ops.pallas_attn import (_full_ref_fastcore, _shift_runs,
                                      swin_full_block)

H = W = 56
win, shift, C, nH, B = 7, 3, 96, 3, 32
N = win * win
nW = (H // win) * (W // win)
rows = nW * N
ITERS = 20

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B * nW, N, C)) * 0.5, jnp.bfloat16)
params = tuple(
    jnp.asarray(a, jnp.float32 if a.ndim == 1 and i in (0, 1, 6, 7)
                else jnp.bfloat16)
    for i, a in enumerate([
        np.ones(C), np.zeros(C),
        rng.normal(size=(C, 3 * C)) * 0.05, np.zeros(3 * C),
        rng.normal(size=(C, C)) * 0.05, np.zeros(C),
        np.ones(C), np.zeros(C),
        rng.normal(size=(C, 4 * C)) * 0.05, np.zeros(4 * C),
        rng.normal(size=(4 * C, C)) * 0.05, np.zeros(C)]))
rel = jnp.asarray(rng.normal(size=(1, nH, N, N)) * 0.1, jnp.float32)
mask = jnp.asarray(
    np.where(rng.random((nW, N, N)) < 0.2, -100.0, 0.0), jnp.float32)
scale = (C // nH) ** -0.5
keep = 0.9
m = jnp.asarray(rng.integers(0, 2, (B,)), jnp.float32) / keep
dp = (jnp.repeat(m, rows)[:, None], jnp.repeat(m, rows)[:, None])
spec = (H, W, win, shift)
print(f"runs: {len(_shift_runs(H, W, win, shift))}", flush=True)

fused = jax.jit(lambda x: swin_full_block(
    x, params, (rel, mask), scale, nH, interpret=False, shift_spec=spec,
    dp=dp))
t0 = time.perf_counter()
out = jax.device_get(fused(x))
print(f"compile+run OK ({time.perf_counter() - t0:.1f}s)", flush=True)

want = jax.device_get(jax.jit(lambda x: _full_ref_fastcore(
    x, params, (rel, mask), dp, scale, nH, False, shift_spec=spec))(x))
err = float(np.abs(out.astype(np.float32) - want.astype(np.float32)).max())
print(f"fwd max|diff| vs fastcore ref: {err:.2e}", flush=True)


def timeit(fn, *args):
    def loop(*a):
        def body(c, _):
            a2 = tuple(t * (1 + c * 1e-12).astype(t.dtype) for t in a)
            v = fn(*a2)
            return c + v * 1e-12, v
        _, ms = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return ms.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(*args)))
    t0 = time.perf_counter()
    float(jax.device_get(j(*args)))
    return (time.perf_counter() - t0) / ITERS * 1e3


f_k = timeit(lambda x: swin_full_block(
    x, params, (rel, mask), scale, nH, interpret=False, shift_spec=spec,
    dp=dp).astype(jnp.float32).mean(), x)
f_r = timeit(lambda x: _full_ref_fastcore(
    x, params, (rel, mask), dp, scale, nH, False,
    shift_spec=spec).astype(jnp.float32).mean(), x)
print(f"fwd   : kernel {f_k:6.2f} ms   fastcore-roll {f_r:6.2f} ms",
      flush=True)

fb_k = timeit(lambda x: jax.value_and_grad(lambda x: swin_full_block(
    x, params, (rel, mask), scale, nH, interpret=False, shift_spec=spec,
    dp=dp).astype(jnp.float32).mean())(x)[0], x)
fb_r = timeit(lambda x: jax.value_and_grad(lambda x: _full_ref_fastcore(
    x, params, (rel, mask), dp, scale, nH, False,
    shift_spec=spec).astype(jnp.float32).mean())(x)[0], x)
print(f"fwd+bwd: kernel {fb_k:6.2f} ms   fastcore-roll {fb_r:6.2f} ms",
      flush=True)
