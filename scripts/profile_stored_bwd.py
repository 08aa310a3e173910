"""Micro-profile the store-residual Swin backward pieces at stage
geometry (b32): attention_core_bwd alone vs the full stored backward vs
forward, floor-subtracted.

Usage: python scripts/profile_stored_bwd.py [stage ...]
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
B = 32

STAGES = {
    "1": (96, 56, 3),
    "2": (192, 28, 6),
    "3": (384, 14, 12),
    "4": (768, 7, 24),
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
    return time.perf_counter() - t0


FLOOR = None


def timeit(fn, *args):
    def loop(*args):
        def body(c, _):
            a2 = tuple(jax.tree.map(
                lambda t: t * (1 + c * 1e-12).astype(t.dtype), a)
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


def run(tag):
    C, HW, nH = STAGES[tag]
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
        (np.zeros(C), jnp.bfloat16),
    ])
    bias = jnp.asarray(rng.normal(size=(1, nH, N, N)), jnp.float32)
    scale = (C // nH) ** -0.5
    qkv = jnp.asarray(rng.normal(size=(BW, N, 3 * C)) * 0.1, jnp.bfloat16)
    ctx = jnp.asarray(rng.normal(size=(BW, N, C)) * 0.1, jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(BW, N, C)), jnp.bfloat16)

    # 1. forward (no residuals)
    def fwd(x, params, bias):
        return pa.swin_full_block(x, params, bias, scale, nH, 8, False,
                                  None, None).astype(jnp.float32).sum() * 1e-6

    # 2. full f+b through the stored path
    def fb(x, params, bias):
        gr = jax.grad(lambda *a: fwd(*a), argnums=(0, 1, 2))(x, params, bias)
        return sum(jnp.sum(t).astype(jnp.float32)
                   for t in jax.tree.leaves(gr))

    # 3. attention core fwd / bwd alone
    def core_f(qkv, bias):
        return pa.attention_core(qkv, bias, scale, nH).astype(
            jnp.float32).sum() * 1e-6

    def core_b(qkv, g, bias):
        dqkv, dbias = pa.attention_core_bwd(qkv, g, bias, scale, nH)
        return dqkv.astype(jnp.float32).sum() * 1e-6 + dbias.sum() * 1e-6

    # 4. stored backward alone (all pieces incl. core bwd); qkv must be
    # FLAT (BW*N, 3C) as emitted by the save_res forward kernels
    def stored_b(x, params, bias, qkv, ctx, g):
        dx, dp, db, _ = pa._stored_block_bwd(x, params, bias, None,
                                             qkv.reshape(-1, 3 * C),
                                             ctx, g, scale, nH, False)
        return dx.astype(jnp.float32).sum() * 1e-6 + db.sum() * 1e-6 + sum(
            jnp.sum(t).astype(jnp.float32) for t in dp)

    # 5. individual stored-backward pieces (flat-row layouts, as the
    # production composition calls them)
    x2d, ctx2, g2d = x.reshape(-1, C), ctx.reshape(-1, C), g.reshape(-1, C)
    qkv2 = qkv.reshape(-1, 3 * C)
    (ln1s, ln1b, wqkv, bqkv, wproj, bproj,
     ln2s, ln2b, w1, b1, w2, b2) = params

    def mlp_piece(x2d, ctx2, g2d):
        outs = pa.swin_mlp_half_bwd(x2d, ctx2, g2d, wproj, bproj, ln2s,
                                    ln2b, w1, b1, w2, b2, None,
                                    interpret=False)
        return sum(jnp.sum(t).astype(jnp.float32) for t in outs
                   if t is not None) * 1e-6

    def core_piece(qkv2, g2d):
        dqkv2, dbias = pa.attention_core_bwd_flat(qkv2, g2d, bias, N,
                                                  scale, nH)
        return dqkv2.astype(jnp.float32).sum() * 1e-6 + dbias.sum() * 1e-6

    def tail_piece(x2d, qkv2, g2d):
        # prod passes f32 dQKV (core-bwd output) and f32 dres1
        outs = pa.swin_qkv_tail_bwd(x2d, qkv2.astype(jnp.float32),
                                    g2d.astype(jnp.float32),
                                    wqkv, ln1s, ln1b, interpret=False)
        return sum(jnp.sum(t).astype(jnp.float32) for t in outs) * 1e-6

    f = timeit(fwd, x, params, bias)
    t_fb = timeit(fb, x, params, bias)
    cf = timeit(core_f, qkv, bias)
    cb = timeit(core_b, qkv, g, bias)
    sb = timeit(stored_b, x, params, bias, qkv, ctx, g)
    mp = timeit(mlp_piece, x2d, ctx2, g2d)
    cp = timeit(core_piece, qkv2, g2d)
    tp = timeit(tail_piece, x2d, qkv2, g2d)
    print(f"stage {tag} ({HW}x{HW}x{C}): fwd {f:6.2f}  f+b {t_fb:6.2f}  "
          f"core_fwd {cf:6.2f}  core_bwd {cb:6.2f}  stored_bwd {sb:6.2f}\n"
          f"    pieces: mlp_half_bwd {mp:6.2f}  core_bwd_flat {cp:6.2f}  "
          f"qkv_tail_bwd {tp:6.2f}",
          flush=True)


if __name__ == "__main__":
    FLOOR = measure_floor()
    print(f"floor: {FLOOR*1e3:.1f} ms/exec")
    globals()["FLOOR"] = FLOOR
    for tag in (sys.argv[1:] or ["1", "2", "3"]):
        run(tag)
