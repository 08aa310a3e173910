"""Per-stage Swin training-block probe (STAGE=1..4 env var; default 3).

Isolates ONE block at b32/bf16 and splits its time: pallas-vs-XLA,
fwd-vs-f+b, and trace-time ablations of each kernel piece (attend, LN,
GELU, and the three backward kernels) via cheap input-dependent
stand-ins.  NO_ABLATE=1 runs just the two baselines; SHIFT=3 probes the
SW-MSA variant.

ITERS=100 chained in one jit keeps the axon per-execution floor at
~0.24 ms/line (subtract it when quoting absolute per-block numbers —
PERF.md round-4 metrology note).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mvlt_tpu.models.backbones.swin import SwinBlock
from mvlt_tpu.flagship import zeros_init

BATCH = int(os.environ.get("B", "32"))
ITERS = int(os.environ.get("ITERS", "100"))
SHIFT = int(os.environ.get("SHIFT", "0"))
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)

_STAGES = {1: (96, (56, 56), 3), 2: (192, (28, 28), 6),
           3: (384, (14, 14), 12), 4: (768, (7, 7), 24)}
dim, res, heads = _STAGES[int(os.environ.get("STAGE", "3"))]


def timeit(fn, p, x):
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
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.device_get(j(p, x)))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def make(attn_impl):
    class OneBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            return SwinBlock(dim=dim, input_resolution=res, num_heads=heads,
                             window_size=7, shift_size=SHIFT, drop_path=0.1,
                             dtype=dt, attn_impl=attn_impl, name="b")(x, False)
    m = OneBlock()
    xs = jnp.asarray(np.random.default_rng(0).normal(
        size=(BATCH, res[0] * res[1], dim)) * 0.02, dt)
    p = zeros_init(m, xs)["params"]
    return m, p, xs


def run(tag, attn_impl):
    m, p, xs = make(attn_impl)

    def loss(p, x):
        out = m.apply({"params": p}, x,
                      rngs={"dropout": key, "drop_path": key})
        return out.astype(jnp.float32).sum() * 1e-6

    def gsum(p, x):
        g = jax.grad(loss)(p, x)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum().astype(jnp.float32), g, jnp.float32(0))

    f = timeit(loss, p, xs)
    fb = timeit(gsum, p, xs)
    print(f"{tag:28s} fwd {f:7.3f} ms   f+b {fb:7.3f} ms   "
          f"ratio {fb/f:4.2f}", flush=True)
    return f, fb


if __name__ == "__main__":
    print(f"stage-{os.environ.get('STAGE', '3')} one block  "
          f"b{BATCH} shift={SHIFT} ITERS={ITERS}")
    run("pallas (train path)", "auto")
    run("xla", "xla")

    # ablations: swap kernel-body pieces for cheap stand-ins to expose each
    # piece's share (resolved at trace time from the module globals)
    import mvlt_tpu.ops.pallas_attn as pa
    real_attend, real_ln, real_gelu = pa._attend, pa._ln, pa._gelu_exact

    def skip_attend(q, k, v, bias, fast, scale=1.0):
        return v.astype(jnp.float32)

    def skip_ln(xf, scale, bias, eps=1e-5, fast=False):
        return xf * scale + bias

    def skip_gelu(m, fast):
        return m

    real_core_bwd = pa.attention_core_bwd_flat
    real_mlp_bwd = pa.swin_mlp_half_bwd
    real_tail_bwd = pa.swin_qkv_tail_bwd

    def skip_core_bwd(qkv2, dctx2, bias, n, scale, num_heads,
                      interpret=False):
        C = qkv2.shape[1] // 3
        d = jnp.tile(dctx2 * 1e-6, (1, 3)).astype(qkv2.dtype)
        return (d, bias * 1e-6)

    def skip_mlp_bwd(x2, ctx2, g2, wproj, bproj, ln2s, ln2b, w1, b1, w2,
                     b2, dp, interpret=False):
        z = lambda a: a.astype(jnp.float32) * 1e-6
        t = g2[:, :1].astype(jnp.float32) * 1e-6
        ddp = (None, None) if dp is None else (t, t)
        return (g2.astype(jnp.float32) * 1e-6, z(w1), z(b1), z(w2), z(b2),
                z(ln2s), z(ln2b), ddp[0], ddp[1])

    def skip_tail_bwd(x2, dQKV2, dres1, wqkv, ln1s, ln1b, interpret=False):
        z = lambda a: a.astype(jnp.float32) * 1e-6
        return ((x2 * 1e-6 + dQKV2[:, :x2.shape[1]].astype(x2.dtype)
                 + dres1.astype(x2.dtype)).astype(x2.dtype), z(wqkv),
                dQKV2.astype(jnp.float32).sum(0) * 1e-6, z(ln1s), z(ln1b))

    for tag, patch in (("attend", {"_attend": skip_attend}),
                       ("ln", {"_ln": skip_ln}),
                       ("gelu", {"_gelu_exact": skip_gelu}),
                       ("all three", {"_attend": skip_attend,
                                      "_ln": skip_ln,
                                      "_gelu_exact": skip_gelu}),
                       ("bwd core", {"attention_core_bwd_flat":
                                     skip_core_bwd}),
                       ("bwd mlp-half", {"swin_mlp_half_bwd":
                                         skip_mlp_bwd}),
                       ("bwd qkv-tail", {"swin_qkv_tail_bwd":
                                         skip_tail_bwd})):
        if os.environ.get("NO_ABLATE"):
            break
        for k, v in patch.items():
            setattr(pa, k, v)
        try:
            run(f"pallas, {tag} ablated", "auto")
        finally:
            pa._attend, pa._ln, pa._gelu_exact = \
                real_attend, real_ln, real_gelu
            pa.attention_core_bwd_flat = real_core_bwd
            pa.swin_mlp_half_bwd = real_mlp_bwd
            pa.swin_qkv_tail_bwd = real_tail_bwd
