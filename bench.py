"""Benchmark: flagship VQA forward throughput (samples/sec/chip).

Config of record (BASELINE.md / BASELINE.json): Swin-S @224 backbone +
BERT-base single-stream fusion + VQA head, question length 23.  Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is the ratio against the CPU baseline (north star: >=5x
images/sec/chip over CPU on v5e).  The reference PyTorch stack cannot run
in this image (timm/torchvision absent), so the recorded CPU baseline is
this same flagship forward measured on this host's CPU in float32 at
batch 8 — the BASELINE.json comparison config ("answer-classification fwd
pass, batch 8 on CPU").  Override with MVLT_BENCH_CPU_BASELINE or remeasure
with --cpu-baseline.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent compilation cache: the flagship graph takes minutes to
# compile through the remote-compile tunnel; cache hits make repeat
# bench runs (e.g. the driver's end-of-round run) start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

# Measured on this image's CPU (see module docstring): flagship VQA forward,
# batch 8, float32, mean of 5 timed iters after warmup.
CPU_BASELINE_SAMPLES_PER_SEC = 2.95


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def measure(batch: int, dtype, iters: int = 20, warmup: int = 1) -> float:
    """Time ``iters`` chained forwards inside ONE jit program and fetch a
    scalar at the end.  Chaining (each step perturbs the image with the
    previous logits) defeats CSE, and the host fetch defeats async-dispatch
    runtimes where ``block_until_ready`` returns before remote execution
    finishes (observed under the axon TPU tunnel)."""
    import jax
    import jax.numpy as jnp
    from mvlt_tpu.flagship import build_vqa_forward

    fn, (variables, image, question) = build_vqa_forward(batch=batch,
                                                         dtype=dtype)

    def loop(variables, image, question):
        def body(img, _):
            logits = fn(variables, img, question)
            bump = (logits.mean() * 1e-12).astype(img.dtype)
            return img + bump, logits.mean()
        _, means = jax.lax.scan(body, image, None, length=iters)
        return means.sum()

    jloop = jax.jit(loop)
    for _ in range(warmup):
        float(jax.device_get(jloop(variables, image, question)))
    t0 = time.perf_counter()
    val = float(jax.device_get(jloop(variables, image, question)))
    dt = time.perf_counter() - t0
    assert val == val, "NaN benchmark output"
    return batch * iters / dt


def measure_caption_decode(batch: int = 8, num_beams: int = 3,
                           max_length: int = 32) -> float:
    """Report-gen decode throughput (tokens/sec) at beam=3 — the second
    BASELINE.json metric.  Flagship backbone, KV-cached beam search."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
    from mvlt_tpu.models.generation import GenerationSpec, generate
    from mvlt_tpu.models.heads import CaptionModel

    cfg = dataclasses.replace(flagship_vqa_config(), is_decoder=True,
                              max_length=max_length)
    model = CaptionModel(cfg, dtype=jnp.bfloat16)
    image = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 3, 224, 224)), jnp.float32)
    caption = jnp.ones((batch, 4), jnp.int32)
    variables = zeros_init(model, image, caption)
    # unrolled decode: identical results, ~3.8x lower per-step overhead
    # under the axon runtime (NOTES.md)
    spec = GenerationSpec.from_config(cfg, num_beams=num_beams, unroll=True)
    jfn = jax.jit(lambda v, im: generate(model, v, im, spec)[0])
    jax.device_get(jfn(variables, image))
    # one decode is ~65-90 ms — the tunnel's fixed ~25-45 ms dispatch
    # overhead dominates a single execution, so take the best of a few
    # repeats (NOTES.md measurement gotchas)
    dt = min(_timed(lambda: jax.device_get(jfn(variables, image)))
             for _ in range(5))
    return batch * max_length / dt


def measure_retrieval_scoring(batch: int = 128, iters: int = 20) -> float:
    """Retrieval ITM scoring throughput (pairs/sec) — the N^2 grid sweep
    that dominates retrieval eval (reference run_retrieval.py:192-217
    enumerates pairs one Dataset item at a time; here one compiled
    batched scorer)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
    from mvlt_tpu.models.heads import RetrievalModel

    cfg = flagship_vqa_config()
    model = RetrievalModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(batch, 3, 224, 224)), jnp.float32)
    caption = jnp.asarray(rng.integers(1, 30000, (batch, 40)), jnp.int32)
    variables = zeros_init(model, image, caption)

    def loop(variables, image, caption):
        def body(img, _):
            prob = model.apply(variables, img, caption, deterministic=True,
                               method=model.score)
            return img + (prob.mean() * 1e-12).astype(img.dtype), prob.mean()
        _, means = jax.lax.scan(body, image, None, length=iters)
        return means.sum()

    jloop = jax.jit(loop)
    float(jax.device_get(jloop(variables, image, caption)))
    t0 = time.perf_counter()
    float(jax.device_get(jloop(variables, image, caption)))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_retrieval_grid(n: int = 128, iters: int = 8) -> float:
    """PRODUCTION retrieval eval throughput (pairs/sec): encode each image
    ONCE, then sweep the NxN grid fusion-only — the actual
    ``tasks/retrieval.py:score_grid`` path (VERDICT r4 item 2).  The
    older ``measure_retrieval_scoring`` column re-runs the full Swin
    backbone per pair (the reference's worst-case semantics,
    run_retrieval.py:192-217) and stays for comparability.

    One pass scores all n^2 pairs: scan over image rows, each row scoring
    its cached features against all n captions in one fused batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
    from mvlt_tpu.models.heads import RetrievalModel

    cfg = flagship_vqa_config()
    model = RetrievalModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(8, 3, 224, 224)), jnp.float32)
    caption = jnp.asarray(rng.integers(1, 30000, (n, 40)), jnp.int32)
    variables = zeros_init(model, image[:1], caption[:1])

    def encode(variables, image):
        return model.apply(variables, image, deterministic=True,
                           method=model.encode_image)

    feats_small = jax.jit(encode)(variables, image)          # (8, T, H)
    # n distinct feature rows (content irrelevant to throughput)
    feats = jnp.tile(feats_small, (n // 8, 1, 1))

    def sweep(variables, feats, caption):
        def row(carry, fi):
            f = jnp.broadcast_to(fi[None], (n,) + fi.shape)
            p = model.apply(variables, f, caption, deterministic=True,
                            method=model.score_from_features)
            return carry + p.mean(), None
        def one_pass(tot, _):
            # perturb by the carry so the pass is LOOP-DEPENDENT: an
            # invariant body gets hoisted out of the while loop by XLA
            # LICM and the timing then covers ONE pass, inflating the
            # metric by ~iters x (caught round 5: 74k "pairs/s" was
            # physically impossible at ~15 GF/pair)
            f2 = feats * (1 + tot * 1e-20).astype(feats.dtype)
            s, _ = jax.lax.scan(row, jnp.float32(0), f2)
            return tot + s * 1e-12, s
        tot, _ = jax.lax.scan(one_pass, jnp.float32(0), None, length=iters)
        return tot

    jsweep = jax.jit(sweep)
    float(jax.device_get(jsweep(variables, feats, caption)))
    t0 = time.perf_counter()
    float(jax.device_get(jsweep(variables, feats, caption)))
    dt = time.perf_counter() - t0
    return n * n * iters / dt


def measure_pretrain_step(batch: int = 32, iters: int = 10) -> float:
    """Full training-step throughput (fwd+bwd+AdamW), flagship pretrain
    model at the reference's config of record (Swin-S, batch 32, MLM+ITM,
    max_length 80)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvlt_tpu.config import MeshConfig
    from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
    from mvlt_tpu.models.heads import PretrainModel
    from mvlt_tpu.parallel import build_mesh
    from mvlt_tpu.train import (create_train_state, make_optimizer,
                                make_pretrain_step, shard_train_state)

    cfg = dataclasses.replace(flagship_vqa_config(), itm_task=True,
                              max_length=80)
    model = PretrainModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    b = {"image": jnp.asarray(rng.normal(size=(batch, 3, 224, 224)),
                              jnp.float32),
         "caption_masked": jnp.asarray(rng.integers(1, 30000, (batch, 80)),
                                       jnp.int32),
         "caption_label": jnp.asarray(
             np.where(rng.random((batch, 80)) < 0.15,
                      rng.integers(1, 30000, (batch, 80)), -100), jnp.int32),
         "itm_label": jnp.asarray(rng.integers(0, 2, (batch,)), jnp.int32)}
    variables = zeros_init(model, b["image"], b["caption_masked"],
                           b["caption_label"], b["itm_label"])
    mesh = build_mesh(MeshConfig())
    state, shardings = shard_train_state(
        create_train_state(model, variables, make_optimizer(cfg)), mesh)
    step = make_pretrain_step(model, False, mesh, shardings)
    sb = step.shard_batch(b)
    key = jax.random.key(0, impl="rbg")   # production path: TrainConfig.rng_impl
    state, m = step(state, sb, key)
    float(jax.device_get(m["loss"]))       # force completion (axon runtime)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, sb, key)
    float(jax.device_get(m["loss"]))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def flagship_fwd_flops_per_sample() -> float:
    """Analytic forward FLOPs/sample (2xMAC) for the flagship VQA model:
    Swin-S @224 (8.7 GMac, reference flops() calculators
    visual_feature_extractor.py:695-702) + BERT-base fusion over
    1+49+1+23=74 tokens + heads."""
    swin = 8.7e9 * 2
    # fusion: 12 layers x (4 h^2 qkv/out + 2*4 h^2 mlp) * seq + attn seq^2
    h, seq, layers = 768, 74, 12
    per_layer = seq * (4 * h * h + 8 * h * h) * 2 + 2 * seq * seq * h * 2
    return swin + layers * per_layer


def pretrain_fwd_flops_per_sample(text_len: int = 80) -> float:
    """Analytic forward FLOPs/sample (2xMAC) for the flagship PRETRAIN
    model (Swin-S + fusion over 1+49+1+text_len tokens + dual-MLM/ITM
    heads).  The MLM vocab projection (text_len x 768 x 30523) is a real
    ~9% of the forward and is included."""
    swin = 8.7e9 * 2
    h, layers, vocab = 768, 12, 30523
    seq = 1 + 49 + 1 + text_len
    per_layer = seq * (4 * h * h + 8 * h * h) * 2 + 2 * seq * seq * h * 2
    mlm_head = text_len * (h * h + h * vocab) * 2   # transform + decoder
    return swin + layers * per_layer + mlm_head


def peak_flops(platform_device) -> float:
    """Peak bf16 FLOPs/s of the chip (env-overridable MVLT_PEAK_FLOPS)."""
    env = os.environ.get("MVLT_PEAK_FLOPS")
    if env:
        return float(env)
    kind = getattr(platform_device, "device_kind", "").lower()
    table = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
             "v5p": 459e12, "v6": 918e12, "v6e": 918e12}
    for k, v in table.items():
        if k in kind:
            return v
    return 197e12    # default: v5e


def kernel_parity_smoke() -> bool:
    """On-chip Pallas-vs-XLA parity check at small shapes (catches kernel
    drift between rounds — VERDICT r1 item 9).  bf16 tolerance."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mvlt_tpu.ops.pallas_attn import (_block_xla_ref,
                                          window_block_attention)

    rng = np.random.default_rng(0)
    BW, N, C, nH = 16, 49, 96, 3
    x = jnp.asarray(rng.normal(size=(BW, N, C)) * 0.5, jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.05, jnp.bfloat16)
    bqkv = jnp.zeros((3 * C,), jnp.bfloat16)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.05, jnp.bfloat16)
    bproj = jnp.zeros((C,), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(4, nH, N, N)) * 0.1, jnp.float32)
    scale = (C // nH) ** -0.5
    got = jax.jit(lambda *a: window_block_attention(*a, scale, nH))(
        x, wqkv, bqkv, wproj, bproj, bias)
    want = jax.jit(lambda *a: _block_xla_ref(*a, scale, nH))(
        x, wqkv, bqkv, wproj, bproj, bias)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    return err < 0.1


def kernel_bwd_parity_smoke() -> bool:
    """Grad parity for the fused stored-backward kernel path vs the
    MVLT_NO_FUSED_BWD=1 XLA formulation, at a BERT-shaped fusion-encoder
    half (VERDICT r2 item 7 — the round loop now drift-checks the
    backward kernels, not just the forward)."""
    import os
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mvlt_tpu.ops.pallas_attn import fused_attn_ln_masked, fused_mlp_ln_masked

    rng = np.random.default_rng(1)
    B, S, H, nH = 4, 40, 256, 4
    FF = 4 * H
    dt = jnp.bfloat16
    a = lambda *s: jnp.asarray(rng.normal(size=s) * 0.05, dt)
    x = a(B, S, H)
    wqkv, bqkv = a(H, 3 * H), a(3 * H)
    wproj, bproj = a(H, H), a(H)
    kbias = jnp.zeros((B, S), jnp.float32)
    qbias = jnp.asarray(rng.normal(size=(B, S, S)) * 0.1, jnp.float32)
    amask = (jnp.asarray(rng.random((B, nH, S, S)) < 0.9, dt) / dt(0.9))
    hmask = (jnp.asarray(rng.random((B, S, H)) < 0.9, dt) / dt(0.9))
    lns = jnp.ones((H,), jnp.float32)
    lnb = jnp.zeros((H,), jnp.float32)
    w1, b1 = a(H, FF), a(FF)
    w2, b2 = a(FF, H), a(H)
    hmask2 = (jnp.asarray(rng.random((B, S, H)) < 0.9, dt) / dt(0.9))

    def loss(x, wqkv, wproj, w1, w2):
        h = fused_attn_ln_masked(x, wqkv, bqkv, wproj, bproj, kbias, qbias,
                                 amask, hmask, lns, lnb,
                                 (H // nH) ** -0.5, nH, 1e-12, 8, False)
        o = fused_mlp_ln_masked(h, w1, b1, w2, b2, hmask2, lns, lnb,
                                1e-12, 256, False)
        return o.astype(jnp.float32).sum()

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    got = jax.device_get(gfn(x, wqkv, wproj, w1, w2))
    os.environ["MVLT_NO_FUSED_BWD"] = "1"
    try:
        want = jax.device_get(jax.jit(
            jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(x, wqkv, wproj, w1, w2))
    finally:
        del os.environ["MVLT_NO_FUSED_BWD"]
    for g, w in zip(got, want):
        scale = max(1.0, float(np.abs(w.astype(np.float32)).max()))
        if float(np.abs(g.astype(np.float32)
                        - w.astype(np.float32)).max()) > 0.05 * scale:
            return False
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-baseline", action="store_true",
                    help="measure the CPU float32 batch-8 baseline and exit")
    ap.add_argument("--mode", default="vqa",
                    choices=["vqa", "caption", "pretrain", "retrieval",
                             "retrieval_grid"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the extra pretrain/caption/retrieval/parity "
                         "measurements in the default run")
    args = ap.parse_args()

    if args.mode == "caption":
        val = measure_caption_decode(args.batch or 8)
        print(json.dumps({"metric": "caption_beam3_tokens_per_sec",
                          "value": round(val, 2), "unit": "tokens/sec",
                          "vs_baseline": 0.0}))
        return
    if args.mode == "retrieval":
        val = measure_retrieval_scoring(args.batch or 128, args.iters or 20)
        print(json.dumps({"metric": "retrieval_itm_pairs_per_sec",
                          "value": round(val, 2), "unit": "pairs/sec",
                          "vs_baseline": 0.0}))
        return
    if args.mode == "retrieval_grid":
        val = measure_retrieval_grid(args.batch or 128, args.iters or 8)
        print(json.dumps({"metric": "retrieval_grid_pairs_per_sec",
                          "value": round(val, 2), "unit": "pairs/sec",
                          "vs_baseline": 0.0}))
        return
    if args.mode == "pretrain":
        val = measure_pretrain_step(args.batch or 32, args.iters or 10)
        print(json.dumps({"metric": "pretrain_train_samples_per_sec",
                          "value": round(val, 2), "unit": "samples/sec",
                          "vs_baseline": 0.0}))
        return

    if args.cpu_baseline:
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        val = measure(args.batch or 8, jnp.float32, iters=args.iters or 5,
                      warmup=1)
        print(json.dumps({"metric": "vqa_fwd_samples_per_sec_cpu_f32_b8",
                          "value": round(val, 3), "unit": "samples/sec",
                          "vs_baseline": 1.0}))
        return

    import jax
    import jax.numpy as jnp
    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    batch = args.batch or (128 if on_accel else 8)  # b128 > b64 post-kernels
    dtype = jnp.bfloat16 if on_accel else jnp.float32
    # 60 chained iters: the tunnel's ~24 ms per-EXECUTION floor rides on
    # the single chained program, so floor/iters drops to ~1% of a b128
    # forward (PERF.md round 4 metrology note)
    iters = args.iters or (60 if on_accel else 5)

    val = measure(batch, dtype, iters=iters)
    baseline = float(os.environ.get("MVLT_BENCH_CPU_BASELINE",
                                    CPU_BASELINE_SAMPLES_PER_SEC))
    out = {
        "metric": "vqa_fwd_samples_per_sec_per_chip",
        "value": round(val, 2),
        "unit": "samples/sec",
        "vs_baseline": round(val / baseline, 2),
    }

    # Extra columns in the same JSON line (VERDICT r1 item 10): MFU plus
    # the non-flagship task paths, so round-over-round regressions in
    # pretrain/caption/retrieval are visible.  Soft time budget — each is
    # best-effort and independently skippable; the persistent compilation
    # cache makes repeat rounds cheap.
    if on_accel and not args.headline_only:
        budget = float(os.environ.get("MVLT_BENCH_BUDGET_S", "900"))
        t_start = time.perf_counter()
        out["mfu"] = round(
            flagship_fwd_flops_per_sample() * val
            / peak_flops(jax.devices()[0]), 4)

        def _try(name, fn):
            if time.perf_counter() - t_start > budget:
                return
            try:
                v = fn()
                out[name] = round(v, 2) if isinstance(v, float) else v
            except Exception as e:        # noqa: BLE001 — bench stays up
                out[name] = f"error: {type(e).__name__}"

        _try("kernel_parity_ok", lambda: bool(kernel_parity_smoke()))
        _try("kernel_bwd_parity_ok", lambda: bool(kernel_bwd_parity_smoke()))
        _try("pretrain_train_samples_per_sec",
             lambda: measure_pretrain_step(32, 20))
        if isinstance(out.get("pretrain_train_samples_per_sec"), float):
            # 3x-forward-FLOPs convention (fwd + ~2x fwd for backward);
            # optimizer/overheads included in the measured time, so this
            # is the honest end-to-end training MFU.
            out["train_mfu_3xfwd"] = round(
                3 * pretrain_fwd_flops_per_sample(80)
                * out["pretrain_train_samples_per_sec"]
                / peak_flops(jax.devices()[0]), 4)
        # b32 is the best measured decode batch (PERF.md); b8 understated
        # the system and was dominated by the axon dispatch floor.
        _try("caption_beam3_tokens_per_sec",
             lambda: measure_caption_decode(32))
        _try("retrieval_itm_pairs_per_sec",
             lambda: measure_retrieval_scoring(128, 20))
        _try("retrieval_grid_pairs_per_sec",
             lambda: measure_retrieval_grid(128, 8))
    # label the forward-only MFU explicitly (VERDICT r2 weak item 2)
    if "mfu" in out:
        out["fwd_mfu"] = out.pop("mfu")
    # Methodology version (VERDICT r4 item 8): bump when the measurement
    # method changes so BENCH_r*.json series aren't silently rebased.
    #   1 = rounds 1-3 (single-execution timing; carries the ~24 ms
    #       per-execution tunnel floor in short runs)
    #   2 = round 4+ (chained-iteration programs, floor amortized to ~1%)
    #   3 = round 5+ (adds retrieval_grid_pairs_per_sec production path)
    out["methodology"] = 3
    print(json.dumps(out))


if __name__ == "__main__":
    main()
