"""Cumulative pieces of the flagship pretrain TRAIN forward (b32):
adapter / embeddings+fusion / +gathered-head / full loss — to locate
non-encoder overhead."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import jax, jax.numpy as jnp, numpy as np
from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
from mvlt_tpu.models.heads import PretrainModel

ITERS = 20
cfg = dataclasses.replace(flagship_vqa_config(), itm_task=True, max_length=80)
model = PretrainModel(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
B, L = 32, 80
image = jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32)
cap = jnp.asarray(rng.integers(1, 30000, (B, L)), jnp.int32)
lab = jnp.asarray(np.where(rng.random((B, L)) < 0.15,
                           rng.integers(1, 30000, (B, L)), -100), jnp.int32)
itm = jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32)
variables = zeros_init(model, image, cap, lab, itm)
params = variables["params"]
key = jax.random.key(0, impl="rbg")


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

def timeit(fn):
    def loop(p):
        def body(c, _):
            p2 = jax.tree.map(lambda t: t * (1 + c * 1e-12).astype(t.dtype), p)
            v = fn(p2)
            return c + v * 1e-12, v
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(params)))
    t0 = time.perf_counter()
    float(jax.device_get(j(params)))
    return ((time.perf_counter() - t0) - FLOOR) / ITERS * 1e3


def run_piece(p, upto):
    def m_fn(m):
        feat = m.conv(image, False)
        if upto == "adapter":
            return feat.astype(jnp.float32).sum() * 1e-6
        text_mask = cap > 0
        image_mask = jnp.ones(feat.shape[:2], bool)
        out = m.fusion(cap, text_mask, feat, image_mask,
                       seq2seq_mask=False, deterministic=False)
        if upto == "fusion":
            return out.last_hidden.astype(jnp.float32).sum() * 1e-6
        from mvlt_tpu.ops.layers import (cross_entropy_ignore_index,
                                         gather_label_positions)
        hid, lb = gather_label_positions(out.text_output(), lab, 16)
        logits = m.mlm_head_bidir(hid)
        if upto == "head":
            return logits.astype(jnp.float32).sum() * 1e-6
        return cross_entropy_ignore_index(logits, lb)
    return model.apply({"params": p}, method=lambda m: m_fn(m),
                       rngs={"dropout": key, "drop_path": key})


def full(p):
    out = model.apply({"params": p}, image, cap, lab, itm,
                      deterministic=False, seq2seq=False,
                      rngs={"dropout": key, "drop_path": key})
    return out[0].astype(jnp.float32)


print(f"floor {FLOOR*1e3/ITERS:.2f}")
for tag in ("adapter", "fusion", "head", "loss"):
    print(f"fwd upto {tag:8s}: {timeit(lambda p: run_piece(p, tag)):6.2f} ms",
          flush=True)
print(f"fwd full        : {timeit(full):6.2f} ms", flush=True)
