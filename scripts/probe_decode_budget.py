"""Caption-decode per-step budget (VERDICT r4 item 2): decompose the
beam-3 report-generation decode the way the train step's budget is
decomposed — encode (Swin backbone), prefill (first fusion pass +
cache build), per-token decode step, and finalize — so the 4.2k tok/s
headline has a roofline-style attribution.

Method: chained full decodes at increasing max_length; the slope is the
per-token cost and the intercept is encode+prefill+finalize+floor.  The
encode share is measured separately (backbone-only jit).  All numbers
floor-subtracted (measure_floor pattern, PERF.md round-4 metrology).

Usage: python scripts/probe_decode_budget.py [--batch 32] [--beams 3]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np


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


def timed_best(fn, n=5):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beams", type=int, default=3)
    args = ap.parse_args()

    from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
    from mvlt_tpu.models.generation import GenerationSpec, generate
    from mvlt_tpu.models.heads import CaptionModel

    B = args.batch
    floor = measure_floor()
    print(f"floor = {floor * 1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32)
    caption = jnp.ones((B, 4), jnp.int32)

    # encode share: backbone+adapter only
    cfg = dataclasses.replace(flagship_vqa_config(), is_decoder=True,
                              max_length=32)
    model = CaptionModel(cfg, dtype=jnp.bfloat16)
    variables = zeros_init(model, image, caption)
    # fetch a SCALAR, not the (B, T, H) features — fetching ~5 MB of
    # features through the tunnel would bill transport to the encode
    enc = jax.jit(lambda v, im: model.apply(
        v, im, method=lambda m, i: m.encode_image(i))
        .astype(jnp.float32).sum())
    jax.device_get(enc(variables, image))
    t_enc = timed_best(lambda: float(jax.device_get(
        enc(variables, image)))) - floor
    print(f"encode (Swin+adapter) b{B}: {t_enc * 1e3:7.2f} ms", flush=True)

    # full decode at several lengths -> slope = per-token cost
    lens = (8, 16, 32, 64)
    totals = {}
    for L in lens:
        cfgL = dataclasses.replace(cfg, max_length=L)
        mdl = CaptionModel(cfgL, dtype=jnp.bfloat16)
        spec = GenerationSpec.from_config(cfgL, num_beams=args.beams,
                                         unroll=True)
        jfn = jax.jit(lambda v, im, _m=mdl, _s=spec: generate(
            _m, v, im, _s)[0])
        jax.device_get(jfn(variables, image))
        t = timed_best(lambda: jax.device_get(jfn(variables, image))) - floor
        totals[L] = t
        print(f"decode len {L:3d}: {t * 1e3:8.2f} ms "
              f"({B * L / t:8.0f} tok/s)", flush=True)

    # Marginal per-token cost between consecutive lengths.  NOTE: a
    # single linear fit is the WRONG model here — the static KV cache
    # is sized to max_length, so each decode step's attention scans the
    # full cache and the per-token cost GROWS with L (measured round 5:
    # 5.9 -> 7.5 -> 10.6 ms/token across 8->16->32->64).
    print()
    for a, b in zip(lens, lens[1:]):
        m = (totals[b] - totals[a]) / (b - a)
        print(f"marginal per-token {a:3d}->{b:3d}: {m * 1e3:6.2f} ms "
              f"({B / m:7.0f} tok/s)")
    # fixed share estimated from the shortest length (cache smallest):
    m0 = (totals[lens[1]] - totals[lens[0]]) / (lens[1] - lens[0])
    fixed = totals[lens[0]] - m0 * lens[0]
    print(f"\nfixed (encode+prefill+finalize) ~ {fixed * 1e3:6.2f} ms, "
          f"of which encode {t_enc * 1e3:.2f}")
    t32 = totals[32]
    print(f"budget @ L=32: total {t32 * 1e3:.2f} ms "
          f"(headline-comparable: {B * 32 / t32:.0f} tok/s)")


if __name__ == "__main__":
    main()
