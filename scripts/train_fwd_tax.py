"""Localize the training-mode FORWARD tax (26.2 vs 14.7 ms det, b32):
det vs train forward for the Swin backbone and the fusion+heads halves
separately, plus fusion-train with each dropout class disabled.
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
from mvlt_tpu.models.heads import PretrainModel, cross_entropy_ignore_index

ITERS = 20
BASE = dataclasses.replace(flagship_vqa_config(), itm_task=True,
                           max_length=80)
rng = np.random.default_rng(0)
B, L = 32, 80
image = jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32)
cap = jnp.asarray(rng.integers(1, 30000, (B, L)), jnp.int32)
lab = jnp.asarray(np.where(rng.random((B, L)) < 0.15,
                           rng.integers(1, 30000, (B, L)), -100), jnp.int32)
itm = jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32)
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


def build(cfg):
    model = PretrainModel(cfg, dtype=jnp.bfloat16)
    variables = zeros_init(model, image, cap, lab, itm)
    return model, variables["params"]


model, params = build(BASE)
swin_params = {"conv": params["conv"]}
fusion_params = {k: v for k, v in params.items() if k != "conv"}


def make_feat():
    out = model.apply({"params": params}, image, True,
                      method=lambda m, im, d: m.conv(im, d))
    return jax.lax.stop_gradient(out)


feat_fixed = jax.jit(make_feat)()


def swin_loss(m_, p, det):
    out = m_.apply({"params": {**params, **p}}, image, det,
                   method=lambda m, im, d: m.conv(im, d),
                   rngs=None if det else {"dropout": key, "drop_path": key})
    return out.astype(jnp.float32).sum() * 1e-6


def fusion_loss(m_, base_p, p, det):
    full_p = {**p, "conv": base_p["conv"]}

    def run(m, feat):
        text_mask = cap > 0
        image_mask = jnp.ones(feat.shape[:2], bool)
        out = m.fusion(cap, text_mask, feat, image_mask,
                       seq2seq_mask=False, deterministic=det)
        mlm_logits = m.mlm_head_bidir(out.text_output())
        loss = cross_entropy_ignore_index(mlm_logits, lab)
        itm_logits = m.itm_mlp(out.pooled)
        return loss + cross_entropy_ignore_index(itm_logits, itm)

    out = m_.apply({"params": full_p}, feat_fixed, method=run,
                   rngs=None if det else {"dropout": key, "drop_path": key})
    return out.astype(jnp.float32)


print(f"swin   fwd det  : {timeit(lambda p: swin_loss(model, p, True), swin_params):6.1f} ms", flush=True)
print(f"swin   fwd train: {timeit(lambda p: swin_loss(model, p, False), swin_params):6.1f} ms", flush=True)
print(f"fusion fwd det  : {timeit(lambda p: fusion_loss(model, params, p, True), fusion_params):6.1f} ms", flush=True)
print(f"fusion fwd train: {timeit(lambda p: fusion_loss(model, params, p, False), fusion_params):6.1f} ms", flush=True)

# dropout-class ablations on the fusion half (training mode)
fus = BASE.fusion
for name, repl in [
    ("no attn-drop ", dataclasses.replace(
        fus, attention_probs_dropout_prob=0.0)),
    ("no hidden-drop", dataclasses.replace(fus, hidden_dropout_prob=0.0)),
    ("no dropout    ", dataclasses.replace(
        fus, attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)),
]:
    cfg2 = dataclasses.replace(BASE, fusion=repl)
    m2, p2base = build(cfg2)
    p2 = {k: v for k, v in p2base.items() if k != "conv"}
    t = timeit(lambda p: fusion_loss(m2, p2base, p, False), p2)
    print(f"fusion fwd train {name}: {t:6.1f} ms", flush=True)
