"""Report generation: train (unilm/normal strategies) + periodic beam/greedy
test with the captioning metrics stack (reference
``run_report_generation_cxr.py:315-379, 458-493``)."""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.data.loader import DataLoader
from mvlt_tpu.metrics.eval_cap import CaptionEvaluator, compute_scores
from mvlt_tpu.models.generation import GenerationSpec, generate
from mvlt_tpu.tasks.common import TaskRunner, train_rng
from mvlt_tpu.train import make_caption_step


def train_caption(runner: TaskRunner, train_ds, test_ds=None,
                  epochs: Optional[int] = None, test_freq: int = 5,
                  learning_strategy: str = "unilm",
                  num_beams: int = 5, tokenizer=None) -> List[Dict]:
    tc = runner.train_config
    epochs = epochs if epochs is not None else tc.epochs
    step = make_caption_step(runner.model, learning_strategy, runner.mesh,
                             runner.shardings)
    loader = DataLoader(train_ds, tc.batch_size, shuffle=True, drop_last=True,
                        seed=tc.seed, process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        num_workers=tc.num_workers)
    rng = train_rng(tc)
    evals = []
    for epoch in range(epochs):
        for b in step.prefetch(loader.epoch(epoch)):
            runner.state, metrics = step(runner.state, b, rng)
            runner.log_step(metrics, samples=tc.batch_size)
        if (epoch + 1) % tc.checkpoint_every_epochs == 0:
            runner.save()
        if test_ds is not None and tokenizer is not None \
                and (epoch + 1) % test_freq == 0:
            scores = eval_caption(runner, test_ds, tokenizer,
                                  num_beams=num_beams,
                                  strategy=learning_strategy)
            runner.logger.info("epoch %d eval: %s", epoch, scores)
            evals.append(scores)
    runner.finish()
    return evals


def eval_caption(runner: TaskRunner, test_ds, tokenizer,
                 batch_size: int = 16, num_beams: int = 5,
                 strategy: str = "unilm", max_samples: int = 0,
                 include_meteor: bool = True,
                 quant: str = "") -> Dict[str, float]:
    """Beam/greedy decode the test split, detokenize (stop at
    [SEP]/[PAD]/[END], reference :335-346), score with the metrics stack +
    the R2Gen-style double-check (:370-376).

    ``quant="int8w"``: weight-only int8 serving — the big 2-D kernels
    are held in device memory as int8 + per-channel scales and
    dequantized to bf16 inside the jitted decode (see ``ops/quant.py``);
    an extension over the reference, which serves fp16/fp32 only."""
    model = runner.model
    spec = GenerationSpec.from_config(runner.config, num_beams=num_beams,
                                      strategy=strategy)

    params = runner.state.params
    if quant == "int8w":
        from mvlt_tpu.ops.quant import dequantize_tree, quantize_tree_jit
        params, n_q = quantize_tree_jit(params)
        runner.logger.info("int8w serving: %d tensors quantized", n_q)
    elif quant:
        raise ValueError(f"unknown quant mode {quant!r}")

    def _decode_factory():
        def decode(variables, image):
            if quant == "int8w":
                variables = dict(variables,
                                 params=dequantize_tree(variables["params"]))
            return generate(model, variables, image, spec)
        return decode

    decode = runner.compiled(("caption_decode", spec, quant),
                             _decode_factory)

    variables = {"params": params,
                 **runner.state.extra_variables}
    loader = DataLoader(test_ds, batch_size, shuffle=False,
                        num_workers=runner.train_config.num_workers)
    gts, preds = [], []
    for batch in loader.epoch(0):
        m = len(batch["caption"])
        pad = batch_size - m
        img = np.pad(batch["image"],
                     [(0, pad)] + [(0, 0)] * (batch["image"].ndim - 1))
        seqs = np.asarray(decode(variables, jnp.asarray(img))[0])[:m]
        for ids, raw in zip(seqs, batch["raw_caption"]):
            preds.append(tokenizer.decode(ids))
            gts.append(raw)
        if max_samples and len(gts) >= max_samples:
            break
    evaluator = CaptionEvaluator(gts, preds, include_meteor=include_meteor)
    scores = evaluator.evaluate()
    r2gen = compute_scores({i: [g] for i, g in enumerate(gts)},
                           {i: [p] for i, p in enumerate(preds)},
                           include_meteor=include_meteor)
    scores.update({f"r2gen_{k}": v for k, v in r2gen.items()})
    return scores
