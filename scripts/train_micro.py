"""Isolate training-mode overheads: dropout RNG cost in the fusion
encoder, det-vs-train forwards, swin backward pieces (b32, bf16)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
from mvlt_tpu.models.heads import PretrainModel, cross_entropy_ignore_index

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
key = jax.random.PRNGKey(0)


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


def make_feat():
    out = model.apply({"params": params}, image, True,
                      method=lambda m, im, d: m.conv(im, d))
    return jax.lax.stop_gradient(out)


feat_fixed = jax.jit(make_feat)()
fusion_params = {k: v for k, v in params.items() if k != "conv"}
swin_params = {"conv": params["conv"]}


def fusion_loss(p, det):
    full_p = {**p, "conv": params["conv"]}

    def run(m, feat):
        text_mask = cap > 0
        image_mask = jnp.ones(feat.shape[:2], bool)
        out = m.fusion(cap, text_mask, feat, image_mask,
                       seq2seq_mask=False, deterministic=det)
        mlm_logits = m.mlm_head_bidir(out.text_output())
        loss = cross_entropy_ignore_index(mlm_logits, lab)
        itm_logits = m.itm_mlp(out.pooled)
        return loss + cross_entropy_ignore_index(itm_logits, itm)

    return model.apply({"params": full_p}, feat_fixed, method=run,
                       rngs=None if det else {"dropout": key,
                                              "drop_path": key}
                       ).astype(jnp.float32)


def fusion_noheads(p, det):
    full_p = {**p, "conv": params["conv"]}

    def run(m, feat):
        text_mask = cap > 0
        image_mask = jnp.ones(feat.shape[:2], bool)
        out = m.fusion(cap, text_mask, feat, image_mask,
                       seq2seq_mask=False, deterministic=det)
        return out.last_hidden.astype(jnp.float32).sum() * 1e-6

    return model.apply({"params": full_p}, feat_fixed, method=run,
                       rngs=None if det else {"dropout": key,
                                              "drop_path": key}
                       ).astype(jnp.float32)


def swin_loss(p, det):
    out = model.apply({"params": {**params, **p}}, image, det,
                      method=lambda m, im, d: m.conv(im, d),
                      rngs=None if det else {"dropout": key,
                                             "drop_path": key})
    return out.astype(jnp.float32).sum() * 1e-6


def rng_only(p):
    # the 12-layer dropout mask bill, nothing else
    k = jax.random.fold_in(key, jnp.int32(p["itm_mlp"]["bias"].sum()))
    tot = jnp.float32(0)
    for i in range(12):
        k1 = jax.random.fold_in(k, i)
        a = jax.random.bernoulli(k1, 0.9, (B, 12, L, L))
        h1 = jax.random.bernoulli(jax.random.fold_in(k1, 1), 0.9, (B, L, 768))
        h2 = jax.random.bernoulli(jax.random.fold_in(k1, 2), 0.9, (B, L, 768))
        tot += a.sum().astype(jnp.float32) + h1.sum() + h2.sum()
    return tot * 1e-9


print(f"fusion fwd det:        {timeit(lambda p: fusion_loss(p, True), fusion_params):7.1f} ms")
print(f"fusion fwd train:      {timeit(lambda p: fusion_loss(p, False), fusion_params):7.1f} ms")
print(f"fusion fwd det nohead: {timeit(lambda p: fusion_noheads(p, True), fusion_params):7.1f} ms")
print(f"fusion fwd trn nohead: {timeit(lambda p: fusion_noheads(p, False), fusion_params):7.1f} ms")
print(f"dropout RNG only:      {timeit(rng_only, fusion_params):7.1f} ms")
print(f"swin fwd det:          {timeit(lambda p: swin_loss(p, True), swin_params):7.1f} ms")
print(f"swin fwd train:        {timeit(lambda p: swin_loss(p, False), swin_params):7.1f} ms")
