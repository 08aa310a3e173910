"""Time the fusion encoder (BERT-base over [CLS]+49img+[SEP]+23txt = 75
tokens) at flagship batch, plus ablations: attention-core-free variant and
sub-piece timings."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.config import MVLTConfig
from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
from mvlt_tpu.models.fusion import FusionEncoder

ITERS = 30
B = int(os.environ.get("B", "64"))


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


def main():
    cfg = flagship_vqa_config().fusion
    enc = FusionEncoder(cfg, add_pooling_layer=True, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 30000, (B, 23)), jnp.int32)
    tmask = jnp.ones((B, 23), jnp.int32)
    img = jnp.asarray(rng.normal(size=(B, 49, cfg.hidden_size)) * 0.02,
                      jnp.bfloat16)
    imask = jnp.ones((B, 49), jnp.int32)
    variables = zeros_init(enc, text, tmask, img, imask)

    def fwd(img, variables, text, tmask, imask):
        out = enc.apply(variables, text, tmask, img, imask,
                        deterministic=True)
        return out.pooled.astype(jnp.float32)

    t = timeit(fwd, img, variables, text, tmask, imask)
    print(f"fusion encoder fwd b{B} (75 tok): {t*1e3:.3f} ms "
          f"({B/t:.0f} samp/s)")

    on = os.environ.get("MVLT_FUSED_SEQ_ATTN")
    os.environ["MVLT_FUSED_SEQ_ATTN"] = "1"
    t2 = timeit(fwd, img, variables, text, tmask, imask)
    print(f"  with fused_seq_attention kernel: {t2*1e3:.3f} ms")
    if not on:
        del os.environ["MVLT_FUSED_SEQ_ATTN"]


if __name__ == "__main__":
    main()
