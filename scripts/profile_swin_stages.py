"""Per-stage timing of the Swin-S fused-kernel path on the real chip.

Times each stage (and each sub-piece: blocks vs patch-merge vs
partition/roll layout passes) by chaining iterations inside one jit
program and fetching a scalar (axon runtime: block_until_ready returns
early, see bench.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.config import swin_small
from mvlt_tpu.models.backbones.swin import SwinTransformer, SwinBlock
from mvlt_tpu.flagship import zeros_init

BATCH = int(os.environ.get("B", "64"))
ITERS = 20


def timeit(fn, *args):
    def loop(*args):
        def body(x, _):
            out = fn(x, *args[1:])
            bump = (out.mean() * 1e-12).astype(x.dtype)
            # keep shapes: x is the first arg; perturb it
            return x + bump.astype(x.dtype), out.mean()
        _, means = jax.lax.scan(body, args[0], None, length=ITERS)
        return means.sum()

    jloop = jax.jit(loop)
    float(jax.device_get(jloop(*args)))  # warmup/compile
    t0 = time.perf_counter()
    float(jax.device_get(jloop(*args)))
    dt = time.perf_counter() - t0
    return dt / ITERS


def main():
    cfg = swin_small()
    dt = jnp.bfloat16

    # full backbone
    model = SwinTransformer(cfg, dtype=dt)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(BATCH, 3, 224, 224)), jnp.float32)
    variables = zeros_init(model, x)
    full = timeit(lambda img: model.apply(variables, img,
                                          deterministic=True), x)
    print(f"full Swin-S fwd b{BATCH}: {full*1e3:.2f} ms "
          f"({BATCH/full:.0f} img/s)")

    # per-stage: isolated stacks of blocks at each stage's geometry
    stages = [
        (0, 96, (56, 56), 3, 2),
        (1, 192, (28, 28), 6, 2),
        (2, 384, (14, 14), 12, 18),
        (3, 768, (7, 7), 24, 2),
    ]
    for i, dim, res, heads, depth in stages:
        class Stack(jax.tree_util.__class__ if False else object):
            pass

        from flax import linen as nn

        class StageStack(nn.Module):
            @nn.compact
            def __call__(self, x):
                for b in range(depth):
                    x = SwinBlock(dim=dim, input_resolution=res,
                                  num_heads=heads, window_size=7,
                                  shift_size=0 if b % 2 == 0 else 3,
                                  dtype=dt, name=f"b{b}")(x, True)
                return x

        m = StageStack()
        xs = jnp.zeros((BATCH, res[0] * res[1], dim), dt)
        vs = zeros_init(m, xs)
        t = timeit(lambda a: m.apply(vs, a), xs)
        print(f"stage {i+1} ({depth} blocks, {res[0]}x{res[1]}x{dim}): "
              f"{t*1e3:.2f} ms  ({t*1e3/depth:.3f} ms/block)")

        # same geometry, single unshifted + single shifted block
        for shift, tag in ((0, "W-MSA"), (3, "SW-MSA")):
            class OneBlock(nn.Module):
                @nn.compact
                def __call__(self, x):
                    return SwinBlock(dim=dim, input_resolution=res,
                                     num_heads=heads, window_size=7,
                                     shift_size=shift, dtype=dt,
                                     name="b")(x, True)
            m1 = OneBlock()
            v1 = zeros_init(m1, xs)
            t1 = timeit(lambda a: m1.apply(v1, a), xs)
            print(f"  single {tag} block: {t1*1e3:.3f} ms")


if __name__ == "__main__":
    main()
