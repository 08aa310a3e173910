"""VQA finetune + eval (reference ``run_vqa.py:77-190, 193-324``):
AdamW train loop with per-epoch validation, best-checkpoint keeping, and
open/closed accuracy reporting."""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.data.loader import DataLoader
from mvlt_tpu.metrics.vqa import vqa_accuracy
from mvlt_tpu.tasks.common import TaskRunner, train_rng
from mvlt_tpu.train import make_vqa_step


def eval_vqa(runner: TaskRunner, dataset, batch_size: int = 64,
             predictions_path: Optional[str] = None) -> Dict[str, float]:
    """testVQA equivalent (run_vqa.py:137-190)."""
    model = runner.model

    def _fwd_factory():
        def fwd(variables, image, question):
            _, logits = model.apply(variables, image, question,
                                    deterministic=True)
            return jnp.argmax(logits, -1)
        return fwd

    fwd = runner.compiled("vqa_eval_fwd", _fwd_factory)

    variables = {"params": runner.state.params,
                 **runner.state.extra_variables}
    loader = DataLoader(dataset, batch_size, shuffle=False,
                        num_workers=runner.train_config.num_workers)
    preds, labels, types = [], [], []
    for batch in loader.epoch(0):
        n = len(batch["label"])
        # pad the tail batch to the compiled shape
        pad = batch_size - n
        img = np.pad(batch["image"], [(0, pad)] + [(0, 0)] * (batch["image"].ndim - 1))
        q = np.pad(batch["question"], [(0, pad), (0, 0)])
        p = np.asarray(fwd(variables, jnp.asarray(img), jnp.asarray(q)))[:n]
        preds.extend(p.tolist())
        labels.extend(np.asarray(batch["label"]).tolist())
        types.extend(batch["answer_type"])
    acc = vqa_accuracy(preds, labels, types)
    if predictions_path:
        os.makedirs(os.path.dirname(predictions_path) or ".", exist_ok=True)
        with open(predictions_path, "w") as f:
            json.dump([{"pred": int(p), "label": int(l), "answer_type": t}
                       for p, l, t in zip(preds, labels, types)], f)
    return acc


def train_vqa(runner: TaskRunner, train_ds, valid_ds=None, test_ds=None,
              epochs: Optional[int] = None) -> Dict[str, float]:
    """trainVQA equivalent (run_vqa.py:77-118): per-epoch valid; track best."""
    tc = runner.train_config
    epochs = epochs if epochs is not None else tc.epochs
    step = make_vqa_step(runner.model, runner.mesh, runner.shardings)
    loader = DataLoader(train_ds, tc.batch_size, shuffle=True, drop_last=True,
                        seed=tc.seed, process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        num_workers=tc.num_workers)
    rng = train_rng(tc)
    best = {"valid_acc": -1.0, "epoch": -1}
    for epoch in range(epochs):
        for b in step.prefetch(loader.epoch(epoch)):
            runner.state, metrics = step(runner.state, b, rng)
            runner.log_step(metrics, samples=tc.batch_size)
        if valid_ds is not None:
            acc = eval_vqa(runner, valid_ds, tc.batch_size)
            runner.logger.info("epoch %d valid acc %.4f", epoch,
                               acc["overall"])
            if acc["overall"] > best["valid_acc"]:
                best = {"valid_acc": acc["overall"], "epoch": epoch}
                runner.save()
        elif (epoch + 1) % tc.checkpoint_every_epochs == 0:
            runner.save()
    runner.finish()
    if test_ds is not None:
        # last-epoch weights ("vqa final results", run_vqa.py:294-297)
        best["test_final"] = eval_vqa(runner, test_ds, tc.batch_size)
        # headline: reload the best-valid checkpoint for the test run
        # ("pick the best in valid set", run_vqa.py:300-307) — without
        # the restore this would silently report last-epoch weights
        if valid_ds is not None and runner.workdir and best["epoch"] >= 0:
            runner.maybe_restore()
        best["test"] = eval_vqa(runner, test_ds, tc.batch_size)
    return best
