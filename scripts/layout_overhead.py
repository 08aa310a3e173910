"""Quantify XLA-side layout passes (partition/roll/reverse) around the
fused Swin block kernel: time the in-model block vs the bare kernel on
pre-partitioned windows."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mvlt_tpu.flagship import zeros_init
from mvlt_tpu.models.backbones.swin import SwinBlock
from mvlt_tpu.ops.pallas_attn import swin_full_block

ITERS = 30
B = 64


def timeit(fn, *args):
    def loop(*args):
        def body(x, _):
            out = fn(x, *args[1:])
            return x + (out.mean() * 1e-12).astype(x.dtype), out.mean()
        _, means = jax.lax.scan(body, args[0], None, length=ITERS)
        return means.sum()
    jloop = jax.jit(loop)
    float(jax.device_get(jloop(*args)))
    t0 = time.perf_counter()
    float(jax.device_get(jloop(*args)))
    return (time.perf_counter() - t0) / ITERS


def bare_kernel_time(dim, res, heads, shift):
    """swin_full_block on pre-partitioned (BW, 49, C) windows; shifted
    variant uses the padded bias exactly as the in-model path builds it."""
    from mvlt_tpu.models.backbones.swin import (relative_position_index,
                                                shifted_window_mask)
    N = 49
    nW = (res[0] // 7) ** 2
    BW = B * nW
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BW, N, dim)) * 0.02, jnp.bfloat16)
    rel = jnp.zeros((N, N, heads), jnp.float32).transpose(2, 0, 1)
    combined = rel[None]
    if shift:
        combined = combined + jnp.asarray(
            shifted_window_mask(res[0], res[1], 7, 3))[:, None]
    C = dim
    params = (
        jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
        jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.02, jnp.bfloat16),
        jnp.zeros((3 * C,), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(C, C)) * 0.02, jnp.bfloat16),
        jnp.zeros((C,), jnp.bfloat16),
        jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
        jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.02, jnp.bfloat16),
        jnp.zeros((4 * C,), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(4 * C, C)) * 0.02, jnp.bfloat16),
        jnp.zeros((C,), jnp.bfloat16),
    )
    scale = (C // heads) ** -0.5
    t = timeit(lambda a: swin_full_block(a, params, combined, scale, heads),
               x)
    return t


def in_model_time(dim, res, heads, shift):
    class OneBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            return SwinBlock(dim=dim, input_resolution=res, num_heads=heads,
                             window_size=7, shift_size=shift,
                             dtype=jnp.bfloat16, name="b")(x, True)
    m = OneBlock()
    xs = jnp.zeros((B, res[0] * res[1], dim), jnp.bfloat16)
    vs = zeros_init(m, xs)
    return timeit(lambda a: m.apply(vs, a), xs)


if __name__ == "__main__":
    for dim, res, heads in [(96, (56, 56), 3), (192, (28, 28), 6),
                            (384, (14, 14), 12)]:
        for shift in (0, 3):
            tm = in_model_time(dim, res, heads, shift)
            tk = bare_kernel_time(dim, res, heads, shift)
            tag = "SW" if shift else " W"
            print(f"{res[0]}x{res[1]}x{dim} {tag}: in-model {tm*1e3:6.3f} ms"
                  f"  bare kernel {tk*1e3:6.3f} ms  layout {100*(tm-tk)/tm:4.1f}%")
