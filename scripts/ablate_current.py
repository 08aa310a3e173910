"""Ablate the CURRENT production swin_full_block by monkeypatching its
helpers; subtracts the measured fixed per-execution tunnel cost.

Usage: python scripts/ablate_current.py [stage]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mvlt_tpu.ops.pallas_attn as pa

ITERS = 50

STAGES = {
    "1": (96, 56, 3),
    "2": (192, 28, 6),
    "3": (384, 14, 12),
}


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
    return time.perf_counter() - t0      # total fixed cost of one execution


def run(C, HW, nH, B=64):
    nW = (HW // 7) ** 2
    BW = B * nW
    N = 49
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BW, N, C)) * 0.02, jnp.bfloat16)
    params = tuple(jnp.asarray(a, d) for a, d in [
        (np.ones(C), jnp.float32), (np.zeros(C), jnp.float32),
        (rng.normal(size=(C, 3 * C)) * 0.02, jnp.bfloat16),
        (np.zeros(3 * C), jnp.bfloat16),
        (rng.normal(size=(C, C)) * 0.02, jnp.bfloat16),
        (np.zeros(C), jnp.bfloat16),
        (np.ones(C), jnp.float32), (np.zeros(C), jnp.float32),
        (rng.normal(size=(C, 4 * C)) * 0.02, jnp.bfloat16),
        (np.zeros(4 * C), jnp.bfloat16),
        (rng.normal(size=(4 * C, C)) * 0.02, jnp.bfloat16),
        (np.zeros(C), jnp.bfloat16)])
    bias = jnp.zeros((1, nH, N, N), jnp.float32)
    scale = (C // nH) ** -0.5

    def call(x):
        return pa._full_forward(x, params, bias, scale=scale, num_heads=nH,
                                group=16, interpret=False)

    def loop(x):
        def body(c, _):
            o = call(c)
            return c * 0.5 + o * 0.5, o.reshape(-1)[0]
        _, m = jax.lax.scan(body, x, None, length=ITERS)
        return m.sum()

    j = jax.jit(loop)
    float(jax.device_get(j(x)))
    t0 = time.perf_counter()
    total = time.perf_counter()
    float(jax.device_get(j(x)))
    total = time.perf_counter() - t0
    return total


def main():
    floor = measure_floor()
    print(f"fixed per-execution floor: {floor*1e3:.1f} ms")

    stage = sys.argv[1] if len(sys.argv) > 1 else "3"
    C, HW, nH = STAGES[stage]

    orig_attend = pa._attend
    orig_gelu = pa._gelu_exact
    orig_ln = pa._ln

    def no_attend(q, k, v, bias, fast):
        return v.astype(jnp.float32) * 1.0001

    def dots_only(q, k, v, bias, fast):
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.dot_general((s * 1e-3).astype(v.dtype), v,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def no_gelu(m, fast):
        return m * 0.5

    def no_ln(xf, s, b, eps=1e-5, fast=False):
        return xf * 1.0001

    variants = [
        ("full", {}),
        ("attn->copy", {"_attend": no_attend}),
        ("attn dots only (no softmax)", {"_attend": dots_only}),
        ("gelu->scale", {"_gelu_exact": no_gelu}),
        ("ln->scale", {"_ln": no_ln}),
    ]
    for name, patch in variants:
        for k_, v_ in patch.items():
            setattr(pa, k_, v_)
        t = run(C, HW, nH)
        real = (t - floor) / ITERS
        print(f"stage {stage} {name:30s}: {real*1e3:7.3f} ms/block")
        pa._attend = orig_attend
        pa._gelu_exact = orig_gelu
        pa._ln = orig_ln


if __name__ == "__main__":
    main()
