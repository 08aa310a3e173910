"""Shift-permutation cost: XLA gather (jnp.take) vs one-hot matmul vs
in-kernel run copies, at Swin SW-MSA backward geometry (b32).

The stored-shift backward permutes x, g (and dp) into the shifted
window layout and dx back — 3-4 gathers per SW-MSA block, 13 blocks
per step."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.ops.pallas_attn import _shift_perm

ITERS = 50
B = 32


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


def timeit(fn, floor, *args):
    def loop(*args):
        def body(c, _):
            a2 = tuple(a * (1 + c * 1e-12).astype(a.dtype) for a in args)
            v = fn(*a2)
            return c + v * 1e-12, v
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(*args)))
    t0 = time.perf_counter()
    float(jax.device_get(j(*args)))
    return ((time.perf_counter() - t0) - floor) / ITERS * 1e3


STAGES = {"1": (96, 56), "2": (192, 28), "3": (384, 14)}


def run(tag, floor):
    C, HW = STAGES[tag]
    window, shift = 7, 3
    nW = (HW // 7) ** 2
    L = nW * 49
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, C)) * 0.1, jnp.bfloat16)

    perm = jnp.asarray(_shift_perm(HW, HW, window, shift))
    onehot = jnp.asarray(
        np.eye(L, dtype=np.float32)[np.asarray(perm)], jnp.bfloat16)
    # perm as one-hot: out[i] = x[perm[i]] -> onehot[i, j] = (j == perm[i])

    def take(x):
        o = jnp.take(x, perm, axis=1)
        return o.astype(jnp.float32).sum() * 1e-6

    def oh(x):
        o = jnp.einsum("ij,bjc->bic", onehot, x,
                       preferred_element_type=jnp.bfloat16)
        return o.astype(jnp.float32).sum() * 1e-6

    tt = timeit(take, floor, x)
    to = timeit(oh, floor, x)
    print(f"stage {tag} ({HW}x{HW}x{C}, L={L}): take {tt:6.3f} ms  "
          f"onehot-mm {to:6.3f} ms", flush=True)


if __name__ == "__main__":
    floor = measure_floor()
    print(f"floor: {floor*1e3/ITERS:.2f} ms/exec-equiv", flush=True)
    for tag in (sys.argv[1:] or ["1", "2", "3"]):
        run(tag, floor)
