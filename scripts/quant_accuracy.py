"""On-chip int8w accuracy delta at flagship geometry: VQA logits and
caption beam-3 decode, quantized (weight-only int8, ops/quant.py) vs
bf16 baseline, plus the resident-weight byte saving."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.flagship import flagship_vqa_config
from mvlt_tpu.models.generation import GenerationSpec, generate
from mvlt_tpu.models.heads import CaptionModel, VQAModel
from mvlt_tpu.ops.quant import (dequantize_tree, quantize_tree_jit,
                                quantized_bytes)

B = 16
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B, 3, 224, 224)), jnp.float32)
txt = jnp.asarray(rng.integers(1, 30000, (B, 23)), jnp.int32)

def shape_random_init(model, *args):
    """Host-filled random params from eval_shape (a real ``model.init``
    at flagship geometry compiles for minutes on this harness; for a
    quantization delta only non-trivial weight VALUES matter, not their
    training-realism).  2-D+ leaves ~ N(0, 0.02); 1-D leaves = 1 so LN
    and BN scales pass signal through."""
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *args))
    r = np.random.default_rng(7)
    return jax.tree.map(
        lambda s: jnp.asarray(r.normal(size=s.shape) * 0.02, s.dtype)
        if len(s.shape) >= 2 else jnp.ones(s.shape, s.dtype), shapes)


TRAIN = int(os.environ.get("TRAIN", "0"))


def train_steps(model, variables, loss_args, loss_kwargs, steps,
                lr=3e-4):
    """Fit the model to ONE fixed synthetic batch for ``steps`` chained
    AdamW steps (memorization drives real logit margins — the regime
    the int8 delta matters in).  Returns trained variables."""
    import optax
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-6, weight_decay=1e-4)
    params = variables["params"]
    opt = tx.init(params)
    key = jax.random.key(0, impl="rbg")

    def loss_fn(p, rng):
        out = model.apply(dict(variables, params=p), *loss_args,
                          method=model.loss, deterministic=False,
                          rngs={"dropout": rng}, **loss_kwargs)
        return (out[0] if isinstance(out, tuple) else out).astype(
            jnp.float32)

    def chained(params, opt):
        def body(c, i):
            p, o = c
            l, g = jax.value_and_grad(loss_fn)(
                p, jax.random.fold_in(key, i))
            up, o2 = tx.update(g, o, p)
            return (optax.apply_updates(p, up), o2), l
        (p, o), losses = jax.lax.scan(body, (params, opt),
                                      jnp.arange(steps))
        return p, losses

    p, losses = jax.jit(chained)(params, opt)
    lo = np.asarray(jax.device_get(losses))
    print(f"  trained {steps} steps: loss {lo[0]:.3f} -> {lo[-1]:.3f}",
          flush=True)
    return dict(variables, params=p)


cfg = flagship_vqa_config()
vqa = VQAModel(cfg, dtype=jnp.bfloat16)
variables = shape_random_init(vqa, img, txt)
if TRAIN:
    vqa_label = jnp.asarray(rng.integers(0, cfg.result_num, (B,)),
                            jnp.int32)
    variables = train_steps(vqa, variables, (img, txt, vqa_label), {},
                            TRAIN)
qparams, n_q = quantize_tree_jit(variables["params"])
qb, ob = quantized_bytes(qparams)
print(f"quantized {n_q} tensors; resident bytes {qb/1e6:.0f}MB vs "
      f"{ob/1e6:.0f}MB bf16", flush=True)

_, base = jax.jit(vqa.apply)(variables, img, txt)
ql = jax.jit(lambda qp, i, t: vqa.apply(
    dict(variables, params=dequantize_tree(qp)), i, t))(qparams, img, txt)[1]
b = np.asarray(base, np.float64)
q = np.asarray(ql, np.float64)
cos = (b * q).sum() / (np.linalg.norm(b) * np.linalg.norm(q) + 1e-12)
top1 = float((b.argmax(-1) == q.argmax(-1)).mean())
derr = np.abs(b - q).max()
# at random init the top-1/top-2 logit gap is ~0 (argmax is a coin
# flip under ANY perturbation), so raw top-1 agreement is meaningless;
# report it restricted to samples whose baseline margin exceeds the
# worst-case logit perturbation — the regime trained models live in
srt = np.sort(b, axis=-1)
margin = srt[:, -1] - srt[:, -2]
decided = margin > 2 * derr
top1_m = float((b.argmax(-1) == q.argmax(-1))[decided].mean()) \
    if decided.any() else float("nan")
print(f"VQA logits: cos {cos:.6f}  max|dlogit| {derr:.4f}  "
      f"logit std {b.std():.4f}  top-1 agreement {top1:.3f} raw / "
      f"{top1_m:.3f} on margin>2*max|dlogit| "
      f"({int(decided.sum())}/{len(decided)} samples)", flush=True)

ccfg = dataclasses.replace(cfg, is_decoder=True, max_length=16)
cap = CaptionModel(ccfg, dtype=jnp.bfloat16)
cvars = shape_random_init(cap, img, txt)
if TRAIN:
    # 'normal' strategy: every position is supervised with its own token
    # (MIMIC-style labels, run_report_generation_cxr.py:229-230)
    cvars = train_steps(cap, cvars, (img, txt, txt),
                        {"learning_strategy": "normal"}, TRAIN)
spec = GenerationSpec.from_config(ccfg, num_beams=3)
base_seq = np.asarray(jax.jit(lambda v, i: generate(cap, v, i, spec)[0])(
    cvars, img))
cq, _ = quantize_tree_jit(cvars["params"])
q_seq = np.asarray(jax.jit(lambda qp, i: generate(
    cap, dict(cvars, params=dequantize_tree(qp)), i, spec)[0])(cq, img))
print(f"caption beam-3 token agreement: "
      f"{float((base_seq == q_seq).mean()):.3f}", flush=True)
