"""Direct training-mode f+b timing of the FULL Swin backbone (b32, bf16).

PERF.md's round-3 decomposition attributed ~48 ms of the 76 ms pretrain
step to the Swin side by subtraction (step minus fusion).  Measured
directly (this script, floor-subtracted): train fwd 6.5 ms, f+b 35.3 ms
— i.e. ~11 ms of the step is NOT Swin or fusion, and the backbone
backward runs at 4.4x forward (healthy is ~2x; the per-block profiles
hid this under their unsubtracted per-line dispatch floors).

Attribution probes:
  - full Swin-S (2,2,18,2) train fwd / f+b / f+b(dx only) /
    f+b(no rel-pos table grads)
  - depth variants (2,2,2,2) and (2,2,6,2): marginal stage-3 block cost
    at the model level (includes inter-block glue the per-block probes
    don't see)
  - patch-embed-only floor
  - deterministic f+b for reference (run LAST: it exercises the
    grad-of-deterministic path that needed the shift-kernel vmem fix)

Env: B, ITERS, SKIP (comma list of probe names to skip).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvlt_tpu.models.backbones.swin import SwinTransformer, PatchEmbed
from mvlt_tpu.config import swin_small
from mvlt_tpu.flagship import zeros_init

BATCH = int(os.environ.get("B", "32"))
ITERS = int(os.environ.get("ITERS", "30"))
SKIP = set(os.environ.get("SKIP", "").split(","))
dt = jnp.bfloat16
key = jax.random.key(0, impl="rbg")


def measure_floor():
    @jax.jit
    def tiny(c):
        return c + 1.0
    c = jnp.float32(0)
    float(jax.device_get(tiny(c)))
    t0 = time.perf_counter()
    for _ in range(20):
        c = tiny(c)
    float(jax.device_get(c))
    return (time.perf_counter() - t0) / 20 * 1e3


def timeit(fn, p, x, floor):
    def loop(p, x):
        def body(c, _):
            p2 = jax.tree.map(lambda a: a * (1 + c * 1e-12).astype(a.dtype), p)
            v = fn(p2, x)
            return c + v * 1e-12, v
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(p, x)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(j(p, x)))
        best = min(best, time.perf_counter() - t0)
    return (best * 1e3 - floor) / ITERS


def probes(label, model, x, floor, train=True, extras=False):
    v = zeros_init(model, x)
    p = v["params"]

    def loss(p, x):
        out = model.apply({"params": p}, x, not train,
                          rngs={"dropout": key, "drop_path": key})
        return out.astype(jnp.float32).sum() * 1e-6

    def gsum(p, x):
        g = jax.grad(loss)(p, x)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum().astype(jnp.float32), g, jnp.float32(0))

    f = timeit(loss, p, x, floor)
    fb = timeit(gsum, p, x, floor)
    line = f"{label:28s} fwd {f:7.2f}  f+b {fb:7.2f}  ratio {fb/max(f,1e-9):4.2f}"
    if extras:
        def gx(p, x):
            return jax.grad(loss, argnums=1)(p, x).sum().astype(jnp.float32)

        def gnotab(p, x):
            def loss2(p2, x):
                p3 = jax.tree_util.tree_map_with_path(
                    lambda kp, a: jax.lax.stop_gradient(a)
                    if "relative_position_bias_table" in str(kp) else a, p2)
                return loss(p3, x)
            g = jax.grad(loss2)(p, x)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum().astype(jnp.float32), g,
                jnp.float32(0))

        fbx = timeit(gx, p, x, floor)
        fbn = timeit(gnotab, p, x, floor)
        line += f"  f+b(dx) {fbx:7.2f}  f+b(noTab) {fbn:7.2f}"
    print(line, flush=True)
    return f, fb


def swin_with_depths(depths):
    cfg = dataclasses.replace(swin_small(), depths=tuple(depths))
    return SwinTransformer(config=cfg, dtype=dt)


def main():
    floor = measure_floor() * ITERS
    print(f"dispatch floor: {floor / ITERS:.2f} ms/exec "
          f"({ITERS} chained iters); env "
          f"NO_FUSED_BWD={os.environ.get('MVLT_NO_FUSED_BWD', '')!r} "
          f"NO_HALF_TRAIN={os.environ.get('MVLT_NO_HALF_TRAIN', '')!r}",
          flush=True)
    x = jnp.zeros((BATCH, 224, 224, 3), dt)

    if "full" not in SKIP:
        probes("Swin-S (2,2,18,2) train", swin_with_depths((2, 2, 18, 2)),
               x, floor, extras=True)
    if "depths" not in SKIP:
        probes("Swin (2,2,2,2) train", swin_with_depths((2, 2, 2, 2)),
               x, floor)
        probes("Swin (2,2,6,2) train", swin_with_depths((2, 2, 6, 2)),
               x, floor)
    if "embed" not in SKIP:
        class EmbedOnly(nn.Module):
            @nn.compact
            def __call__(self, x, deterministic=True):
                return PatchEmbed(4, 96, True, dtype=dt,
                                  name="patch_embed")(x)
        probes("patch embed only", EmbedOnly(), x, floor)
    if "determ" not in SKIP:
        probes("Swin-S (2,2,18,2) determ", swin_with_depths((2, 2, 18, 2)),
               x, floor, train=False)


if __name__ == "__main__":
    main()
