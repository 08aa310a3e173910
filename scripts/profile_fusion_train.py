"""Fusion encoder TRAINING-mode cost decomposition at flagship pretrain
geometry (b32, 129 tok = [CLS]+49img+[SEP]+78txt): fwd and fwd+bwd,
fused-masked vs XLA, dropout on/off, and the mask-generation bill alone.

Timing: chained iters in one jit + host fetch, floor-subtracted."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
from mvlt_tpu.models.fusion import FusionEncoder

ITERS = 20
B, LT = 32, 79            # text tokens; total S = 1+49+LT = 129


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


FLOOR = measure_floor()


def timeit(fn, *args):
    def loop(*args):
        def body(c, _):
            a2 = tuple(jax.tree.map(
                lambda t: (t * (1 + c * 1e-12).astype(t.dtype)
                           if jnp.issubdtype(t.dtype, jnp.floating) else t), a)
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


def main():
    cfg = flagship_vqa_config().fusion
    enc = FusionEncoder(cfg, add_pooling_layer=False, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 30000, (B, LT)), jnp.int32)
    tmask = jnp.ones((B, LT), jnp.int32)
    img = jnp.asarray(rng.normal(size=(B, 49, cfg.hidden_size)) * 0.02,
                      jnp.bfloat16)
    imask = jnp.ones((B, 49), jnp.int32)
    variables = zeros_init(enc, text, tmask, img, imask)
    params = variables["params"]
    key = jax.random.key(0, impl="rbg")

    def fwd(params, det):
        out = enc.apply({"params": params}, text, tmask, img, imask,
                        deterministic=det,
                        rngs=None if det else {"dropout": key})
        return out.last_hidden.astype(jnp.float32).mean()

    def fb(params, det):
        l, gr = jax.value_and_grad(lambda p: fwd(p, det))(params)
        return l + sum(jnp.sum(t).astype(jnp.float32) * 1e-12
                       for t in jax.tree.leaves(gr))

    for name, env in [("fused ", {}),
                      ("xla   ", {"MVLT_NO_FUSED_ENCODER": "1"})]:
        for k, v in env.items():
            os.environ[k] = v
        f_det = timeit(lambda p: fwd(p, True), params)
        f_tr = timeit(lambda p: fwd(p, False), params)
        fb_det = timeit(lambda p: fb(p, True), params)
        fb_tr = timeit(lambda p: fb(p, False), params)
        print(f"{name}: fwd det {f_det:6.2f}  fwd train {f_tr:6.2f}  "
              f"f+b det {fb_det:6.2f}  f+b train {fb_tr:6.2f}", flush=True)
        for k in env:
            del os.environ[k]

    # mask-generation bill alone (12 layers of amask+hmask, rbg)
    S = 1 + 49 + LT
    def masks(key):
        tot = jnp.float32(0)
        for i in range(12):
            k1 = jax.random.fold_in(key, 2 * i)
            k2 = jax.random.fold_in(key, 2 * i + 1)
            am = jax.random.bernoulli(k1, 0.9, (B, 12, S, S)).astype(jnp.bfloat16)
            hm = jax.random.bernoulli(k2, 0.9, (B, S, 768)).astype(jnp.bfloat16)
            tot = tot + am.astype(jnp.float32).sum() * 1e-9 \
                + hm.astype(jnp.float32).sum() * 1e-9
        return tot
    t = timeit(masks, key)
    print(f"mask gen alone (12 layers rbg): {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
