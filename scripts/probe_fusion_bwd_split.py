"""Fusion-encoder backward decomposition (chained, floor-subtracted).

Ablates the two Pallas backward kernels (sequence attention-core bwd,
MLP-half bwd) with cheap input-dependent stand-ins to split the ~18 ms
fusion backward at flagship pretrain geometry (b32, 129 tokens).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
from mvlt_tpu.models.fusion import FusionEncoder

ITERS = int(os.environ.get("ITERS", "40"))
B, LT = 32, 79


def measure_floor():
    x = jnp.ones((8, 128), jnp.bfloat16)
    j = jax.jit(lambda x: (x * 1.000001).sum())
    float(jax.device_get(j(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(j(x)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


FLOOR = measure_floor()


def timeit(fn, p, *args):
    def loop(p, *args):
        def body(c, _):
            p2 = jax.tree.map(
                lambda t: t * (1 + c * 1e-12).astype(t.dtype), p)
            v = fn(p2, *args)
            return c + v * 1e-12, v
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(p, *args)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.device_get(j(p, *args)))
        best = min(best, time.perf_counter() - t0)
    return (best - FLOOR) / ITERS * 1e3


cfg = flagship_vqa_config().fusion
model = FusionEncoder(cfg, add_pooling_layer=False, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B, 49, cfg.hidden_size)) * 0.02,
                  jnp.bfloat16)
txt = jnp.asarray(rng.integers(1, 30000, (B, LT)), jnp.int32)
tmask = jnp.ones((B, LT), jnp.int32)
imask = jnp.ones((B, 49), jnp.int32)
variables = zeros_init(model, txt, tmask, img, imask)
params = variables["params"]
key = jax.random.PRNGKey(0)


def fwd(p, det):
    out = model.apply({"params": p}, txt, tmask, img, imask,
                      deterministic=det,
                      rngs=None if det else {"dropout": key})
    return out.last_hidden.astype(jnp.float32).sum() * 1e-6


def run(tag, det=True):
    f = timeit(lambda p: fwd(p, det), params)

    def gsum(p):
        g = jax.grad(lambda pp: fwd(pp, det))(p)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum().astype(jnp.float32), g, jnp.float32(0))

    fb = timeit(gsum, params)
    print(f"{tag:30s} fwd {f:7.2f} ms   f+b {fb:7.2f} ms   "
          f"bwd {fb - f:6.2f}", flush=True)


if __name__ == "__main__":
    run("fused (det)")

    import mvlt_tpu.ops.pallas_attn as pa
    real_core = pa.seq_attention_core_bwd
    real_mlp = pa.mlp_ln_half_bwd

    def skip_core(qkv, dctx, kbias, qbias, amask, scale, num_heads,
                  interpret=False, adrop=None):
        d = jnp.concatenate([dctx * 1e-6] * 3, axis=-1).astype(qkv.dtype)
        return d, kbias * 1e-6

    def skip_mlp(x2, res2, g2, hmask2, w1, b1, w2, lns, eps=1e-12,
                 interpret=False, h_chunk=0):
        z = lambda a: a.astype(jnp.float32) * 1e-6
        return (g2.astype(jnp.float32) * 1e-6 + res2 * 1e-12, z(w1),
                jnp.zeros((w1.shape[1],), jnp.float32) + 1e-6, z(w2),
                jnp.zeros((w2.shape[1],), jnp.float32) + 1e-6, z(lns),
                z(lns))

    for tag, patch in (
            ("bwd attn-core ablated", {"seq_attention_core_bwd": skip_core}),
            ("bwd mlp-half ablated", {"mlp_ln_half_bwd": skip_mlp}),
            ("both ablated", {"seq_attention_core_bwd": skip_core,
                              "mlp_ln_half_bwd": skip_mlp})):
        for k, v in patch.items():
            setattr(pa, k, v)
        try:
            run(f"fused, {tag}")
        finally:
            pa.seq_attention_core_bwd = real_core
            pa.mlp_ln_half_bwd = real_mlp
