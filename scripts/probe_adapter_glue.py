"""Adapter glue cost: VisualAdapter f+b with depths=(0,0,0,0) — just
normalize + patchify + patch-mergings + LNs + projection (no blocks).
Compares against the full adapter to bound the non-block share.
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
from mvlt_tpu.models.backbones.adapter import VisualAdapter

B = 32
ITERS = int(os.environ.get("ITERS", "50"))
key = jax.random.key(0, impl="rbg")


def measure_floor():
    j = jax.jit(lambda x: (x * 1.000001).sum())
    x = jnp.zeros((8, 128), jnp.float32)
    float(jax.device_get(j(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(j(x)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


FLOOR = measure_floor()


def timeit_grad(loss, p):
    def chained(p, key):
        def body(c, _):
            p2 = jax.tree.map(lambda a: a * (1 + c * 1e-12).astype(a.dtype),
                              p)
            g = jax.grad(loss)(p2, jax.random.fold_in(
                key, c.astype(jnp.int32)))
            s = jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum().astype(jnp.float32), g,
                jnp.float32(0))
            return c + s * 1e-12, s
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    cj = jax.jit(chained)
    float(jax.device_get(cj(p, key)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.device_get(cj(p, key)))
        best = min(best, time.perf_counter() - t0)
    return (best - FLOOR) / ITERS * 1e3


image = jnp.asarray(np.random.default_rng(0).normal(
    size=(B, 3, 224, 224)), jnp.float32)

for depths, tag in ((None, "full adapter"), ((0, 0, 0, 0), "glue only")):
    cfg = flagship_vqa_config()
    if depths is not None:
        cfg = dataclasses.replace(
            cfg, swin=dataclasses.replace(cfg.swin, depths=depths,
                                          drop_path_rate=0.0))
    model = VisualAdapter(cfg, jnp.bfloat16)
    p = zeros_init(model, image, False)["params"]

    def loss(p, rng, model=model):
        out = model.apply({"params": p}, image, False,
                          rngs={"dropout": rng})
        return out.astype(jnp.float32).sum() * 1e-6

    t = timeit_grad(loss, p)
    print(f"{tag:14s}: f+b {t:6.2f} ms", flush=True)
