"""b32 beam-3 decode: bf16 resident weights vs int8w resident
(dequantize-to-bf16 inside the jitted decode), VERDICT r3 next #8.

Each decode runs several times; best-of repeats (single-execution
tunnel floor ~24 ms rides on every number equally).
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
from mvlt_tpu.models.generation import GenerationSpec, generate
from mvlt_tpu.models.heads import CaptionModel
from mvlt_tpu.ops.quant import dequantize_tree, quantize_tree_jit

B = int(os.environ.get("B", "32"))
BEAMS = int(os.environ.get("BEAMS", "3"))
LEN = int(os.environ.get("LEN", "32"))

cfg = dataclasses.replace(flagship_vqa_config(), is_decoder=True,
                          max_length=LEN)
model = CaptionModel(cfg, dtype=jnp.bfloat16)
image = jnp.asarray(np.random.default_rng(0).normal(
    size=(B, 3, 224, 224)), jnp.float32)
caption = jnp.ones((B, 4), jnp.int32)
variables = zeros_init(model, image, caption)
spec = GenerationSpec.from_config(cfg, num_beams=BEAMS, unroll=True)


def bench(tag, fn, *args):
    jax.device_get(fn(*args))
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:22s}: {best * 1e3:7.1f} ms  "
          f"{B * LEN / best:7.0f} tok/s", flush=True)
    return best


bf = jax.jit(lambda v, im: generate(model, v, im, spec)[0])
t_bf = bench("bf16 resident", bf, variables, image)

qparams, n_q = quantize_tree_jit(variables["params"])
q = jax.jit(lambda qp, im: generate(
    model, dict(variables, params=dequantize_tree(qp)), im, spec)[0])
t_q = bench(f"int8w resident ({n_q})", q, qparams, image)
print(f"delta: {(t_bf - t_q) * 1e3:+.1f} ms ({(t_bf / t_q - 1) * 100:+.1f}%)",
      flush=True)
