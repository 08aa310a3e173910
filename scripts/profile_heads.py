"""Isolate the pretrain head/CE cost beyond the fusion encoder at
flagship b32 geometry (bf16, rbg keys — the production path).

Measures f+b of nested prefixes of the fusion-side computation with the
image features held constant:
  enc      : fusion encoder only
  +mlm     : + gather + MLM head (no CE)
  +ce      : + MLM cross-entropy
  +itm     : + ITM head/CE (= the full fusion-side loss)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
from mvlt_tpu.models.heads import (PretrainModel, cross_entropy_ignore_index,
                                   gather_label_positions)

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


def make_feat():
    out = model.apply({"params": params}, image, True,
                      method=lambda m, im, d: m.conv(im, d))
    return jax.lax.stop_gradient(out)


feat_fixed = jax.jit(make_feat)()
fusion_params = {k: v for k, v in params.items() if k != "conv"}


def fusion_loss(p, upto: str):
    full_p = {**p, "conv": params["conv"]}

    def run(m, feat):
        text_mask = cap > 0
        image_mask = jnp.ones(feat.shape[:2], bool)
        out = m.fusion(cap, text_mask, feat, image_mask,
                       seq2seq_mask=False, deterministic=False)
        if upto == "enc":
            return out.last_hidden.astype(jnp.float32).sum() * 1e-6
        text_out, mlm_label = gather_label_positions(
            out.text_output(), lab, cfg.mlm_gather_k)
        mlm_logits = m.mlm_head_bidir(text_out)
        if upto == "mlm":
            return mlm_logits.astype(jnp.float32).sum() * 1e-6
        loss = cross_entropy_ignore_index(mlm_logits, mlm_label)
        if upto == "ce":
            return loss
        itm_logits = m.itm_mlp(out.pooled)
        return loss + cross_entropy_ignore_index(itm_logits, itm)

    return model.apply({"params": full_p}, feat_fixed, method=run,
                       rngs={"dropout": key}).astype(jnp.float32)


def grad_scalar(loss_fn):
    g = jax.grad(loss_fn)
    return lambda p: jax.tree_util.tree_reduce(
        lambda a, b: a + b.sum().astype(jnp.float32), g(p), jnp.float32(0))


def timeit(fn, p):
    def loop(p):
        def body(c, _):
            p2 = jax.tree.map(lambda x: x * (1 + c * 1e-12).astype(x.dtype), p)
            v = fn(p2)
            return c + v * 1e-12, v
        _, m = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return m.sum()
    j = jax.jit(loop)
    float(jax.device_get(j(p)))
    t0 = time.perf_counter()
    float(jax.device_get(j(p)))
    return (time.perf_counter() - t0) / ITERS * 1e3


for upto in ("enc", "mlm", "ce", "itm"):
    t = timeit(grad_scalar(lambda p, u=upto: fusion_loss(p, u)),
               fusion_params)
    print(f"f+b upto {upto:4s}: {t:7.2f} ms", flush=True)
