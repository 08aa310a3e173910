"""Decompose the pretrain step cost: Swin backbone vs fusion+heads,
fwd vs fwd+bwd, training mode (b32, bf16).

Timing: chained iterations inside one jit; host fetch (axon returns
from block_until_ready early)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
from mvlt_tpu.models.heads import PretrainModel

ITERS = int(os.environ.get("ITERS", "20"))
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


def grad_scalar(loss_fn):
    g = jax.grad(loss_fn)
    return lambda p: jax.tree_util.tree_reduce(
        lambda a, b: a + b.sum().astype(jnp.float32), g(p), jnp.float32(0))


# ---- full model -------------------------------------------------------
def full_loss(p, det=False):
    out = model.apply({"params": p}, image, cap, lab, itm,
                      deterministic=det, seq2seq=False,
                      rngs=None if det else {"dropout": key,
                                             "drop_path": key})
    return out[0].astype(jnp.float32)


# ---- Swin backbone only ----------------------------------------------
swin_params = {"conv": params["conv"]}


def swin_loss(p, det=False):
    feat = model.bind({"params": {**params, **p}}).conv(
        image, det) if False else None
    # bind inside jit is fine, but simpler: apply a sub-call via method
    out = model.apply({"params": {**params, **p}}, image, det,
                      method=lambda m, im, d: m.conv(im, d),
                      rngs=None if det else {"dropout": key,
                                             "drop_path": key})
    return out.astype(jnp.float32).sum() * 1e-6


# ---- fusion + heads only (image feature precomputed, constant) -------
feat_const = jnp.asarray(rng.normal(size=(B, 49 * 2 if False else 49, cfg.fusion.hidden_size)), jnp.bfloat16)


def make_feat():
    out = model.apply({"params": params}, image, True,
                      method=lambda m, im, d: m.conv(im, d))
    return jax.lax.stop_gradient(out)


feat_fixed = jax.jit(make_feat)()
fusion_params = {k: v for k, v in params.items() if k != "conv"}


def fusion_loss(p, det=False):
    full_p = {**p, "conv": params["conv"]}

    def run(m, feat):
        text_mask = cap > 0
        image_mask = jnp.ones(feat.shape[:2], bool)
        out = m.fusion(cap, text_mask, feat, image_mask,
                       seq2seq_mask=False, deterministic=det)
        mlm_logits = m.mlm_head_bidir(out.text_output())
        from mvlt_tpu.models.heads import cross_entropy_ignore_index
        loss = cross_entropy_ignore_index(mlm_logits, lab)
        itm_logits = m.itm_mlp(out.pooled)
        return loss + cross_entropy_ignore_index(itm_logits, itm)

    out = model.apply({"params": full_p}, feat_fixed, method=run,
                      rngs=None if det else {"dropout": key,
                                             "drop_path": key})
    return out.astype(jnp.float32)


print(f"swin   fwd: {timeit(lambda p: swin_loss(p), swin_params):7.1f} ms")
print(f"swin   f+b: {timeit(grad_scalar(lambda p: swin_loss(p)), swin_params):7.1f} ms")
print(f"fusion fwd: {timeit(lambda p: fusion_loss(p), fusion_params):7.1f} ms")
print(f"fusion f+b: {timeit(grad_scalar(lambda p: fusion_loss(p)), fusion_params):7.1f} ms")
print(f"full   fwd: {timeit(lambda p: full_loss(p), params):7.1f} ms")
print(f"full   f+b: {timeit(grad_scalar(lambda p: full_loss(p)), params):7.1f} ms")
