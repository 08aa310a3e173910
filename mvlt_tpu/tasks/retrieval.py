"""Image-text retrieval (reference ``run_retrieval.py:148-356``):
train on concat(pos, neg) batches; test by scoring the full NxN grid as a
batched sweep (the reference enumerated N^2 Dataset items one at a time);
rank + R@1/5/10 both directions."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.data.loader import DataLoader
from mvlt_tpu.metrics.retrieval import evaluate_retrieval
from mvlt_tpu.tasks.common import TaskRunner
from mvlt_tpu.train import make_retrieval_step


def train_retrieval(runner: TaskRunner, train_ds,
                    epochs: Optional[int] = None) -> None:
    """trainRetrieval (run_retrieval.py:148-189): batch = cat(pos, neg)."""
    tc = runner.train_config
    epochs = epochs if epochs is not None else tc.epochs
    step = make_retrieval_step(runner.model, runner.mesh, runner.shardings)
    loader = DataLoader(train_ds, tc.batch_size, shuffle=True, drop_last=True,
                        seed=tc.seed, process_index=jax.process_index(),
                        process_count=jax.process_count())
    rng = jax.random.PRNGKey(tc.seed)
    def merged_batches(epoch):
        for batch in loader.epoch(epoch):
            yield {k: np.concatenate([batch["pos"][k], batch["neg"][k]])
                   for k in ("image", "caption", "label")}

    for epoch in range(epochs):
        for b in step.prefetch(merged_batches(epoch)):
            runner.state, metrics = step(runner.state, b, rng)
            runner.log_step(metrics, samples=2 * tc.batch_size)
        if (epoch + 1) % tc.checkpoint_every_epochs == 0:
            runner.save()


def score_grid(runner: TaskRunner, test_ds, batch_size: int = 64
               ) -> Dict[str, np.ndarray]:
    """testRetrieval (run_retrieval.py:192-217): P(match) for all NxN pairs,
    batched through one compiled scorer."""
    model = runner.model

    @jax.jit
    def score(variables, image, caption):
        return model.apply(variables, image, caption, deterministic=True,
                           method=model.score)

    variables = {"params": runner.state.params,
                 **runner.state.extra_variables}
    n = test_ds.img_num
    loader = DataLoader(test_ds, batch_size, shuffle=False)
    sims, labels = [], []
    for batch in loader.epoch(0):
        m = len(batch["label"])
        pad = batch_size - m
        img = np.pad(batch["image"],
                     [(0, pad)] + [(0, 0)] * (batch["image"].ndim - 1))
        cap = np.pad(batch["caption"], [(0, pad), (0, 0)])
        s = np.asarray(score(variables, jnp.asarray(img), jnp.asarray(cap)))[:m]
        sims.extend(s.tolist())
        labels.extend(np.asarray(batch["label"]).tolist())
    return {"similarities": np.asarray(sims).reshape(n, n),
            "labels": np.asarray(labels).reshape(n, n)}


def eval_retrieval(runner: TaskRunner, test_ds,
                   batch_size: int = 64) -> Dict:
    grid = score_grid(runner, test_ds, batch_size)
    return evaluate_retrieval(grid["similarities"], grid["labels"])
