"""MLM+ITM pretraining loop (reference ``pretrain_MVLBert``,
``run_pretrain.py:162-194``): per-batch seq2seq/bidirectional coin flip
(keyed, logged — the reference used unkeyed Python RNG inside forward,
model.py:390-394), per-epoch save_pretrained + periodic snapshots."""

from __future__ import annotations

import os
from typing import Optional

import jax

from mvlt_tpu.data.loader import DataLoader
from mvlt_tpu.tasks.common import TaskRunner, train_rng
from mvlt_tpu.train import make_pretrain_step, seq2seq_coin_flip
from mvlt_tpu.utils import checkpoint as ckpt_lib


def train_pretrain(runner: TaskRunner, train_ds,
                   epochs: Optional[int] = None,
                   export_dir: Optional[str] = None) -> None:
    tc = runner.train_config
    epochs = epochs if epochs is not None else tc.epochs
    steps = {mode: make_pretrain_step(runner.model, mode, runner.mesh,
                                      runner.shardings)
             for mode in (False, True)}
    loader = DataLoader(train_ds, tc.batch_size, shuffle=True, drop_last=True,
                        seed=tc.seed, process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        num_workers=tc.num_workers)
    rng = train_rng(tc)
    flip_rng = train_rng(tc, offset=1)
    n_seq2seq = 0
    for epoch in range(epochs):
        prefetched = steps[False].prefetch(loader.epoch(epoch))
        for i, b in enumerate(prefetched):
            mode = seq2seq_coin_flip(
                jax.random.fold_in(flip_rng, epoch * 1_000_000 + i))
            n_seq2seq += int(mode)
            runner.state, metrics = steps[mode](runner.state, b, rng)
            runner.log_step(metrics, samples=tc.batch_size)
        runner.logger.info("epoch %d done (seq2seq batches so far: %d)",
                           epoch, n_seq2seq)
        if (epoch + 1) % tc.checkpoint_every_epochs == 0:
            runner.save()
            if export_dir and jax.process_index() == 0:
                # per-epoch export + numbered snapshot (run_pretrain.py:190-192)
                variables = {"params": jax.device_get(runner.state.params),
                             **jax.device_get(runner.state.extra_variables)}
                ckpt_lib.save_pretrained(export_dir, runner.config, variables)
                ckpt_lib.save_pretrained(
                    os.path.join(export_dir + f"_epoch{epoch}"),
                    runner.config, variables)
    runner.finish()
