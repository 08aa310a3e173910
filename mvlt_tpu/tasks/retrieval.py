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
from mvlt_tpu.tasks.common import TaskRunner, train_rng
from mvlt_tpu.train import make_retrieval_step


def train_retrieval(runner: TaskRunner, train_ds,
                    epochs: Optional[int] = None) -> None:
    """trainRetrieval (run_retrieval.py:148-189): batch = cat(pos, neg)."""
    tc = runner.train_config
    epochs = epochs if epochs is not None else tc.epochs
    step = make_retrieval_step(runner.model, runner.mesh, runner.shardings)
    loader = DataLoader(train_ds, tc.batch_size, shuffle=True, drop_last=True,
                        seed=tc.seed, process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        num_workers=tc.num_workers)
    rng = train_rng(tc)
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
    runner.finish()


def score_grid(runner: TaskRunner, test_ds, batch_size: int = 64
               ) -> Dict[str, np.ndarray]:
    """testRetrieval (run_retrieval.py:192-217): P(match) for all NxN pairs.

    The visual backbone runs once per IMAGE (N passes, batched and
    cached as fusion-ready features); only the fusion encoder + ITM head
    sweep the N^2 grid.  Exact same probabilities as the reference's
    per-pair recomputation — the backbone output for image i does not
    depend on the caption."""
    model = runner.model
    variables = {"params": runner.state.params,
                 **runner.state.extra_variables}
    n = test_ds.img_num

    def _encode_factory():
        def encode(variables, image):
            return model.apply(variables, image, deterministic=True,
                               method=model.encode_image)
        return encode

    def _score_factory():
        def score_feat(variables, feat, caption):
            return model.apply(variables, feat, caption, deterministic=True,
                               method=model.score_from_features)
        return score_feat

    encode = runner.compiled("retrieval_encode", _encode_factory)
    score_feat = runner.compiled("retrieval_score", _score_factory)

    # 1. materialize per-item images/captions/cap_ids once
    images, caps, cap_ids = [], [], []
    for i in range(n):
        im, cap, _, cap_id = test_ds.source[i]
        images.append(np.asarray(im))
        caps.append(test_ds._cap_ids(cap))
        cap_ids.append(cap_id)
    caps = np.asarray(caps)

    # 2. backbone once per image, batched
    feats = []
    for s0 in range(0, n, batch_size):
        chunk = np.stack(images[s0:s0 + batch_size])
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.pad(chunk, [(0, pad)] + [(0, 0)] * (chunk.ndim - 1))
        f = np.asarray(encode(variables, jnp.asarray(chunk)))
        feats.append(f[:len(chunk) - pad if pad else batch_size])
    feats = jnp.asarray(np.concatenate(feats, axis=0))      # (n, tokens, H)

    # 3. fusion-only sweep over the grid, one image row at a time
    sims = np.zeros((n, n), np.float32)
    caps_j = jnp.asarray(caps)
    for i in range(n):
        row = []
        fi = jnp.broadcast_to(feats[i][None], (batch_size,) + feats.shape[1:])
        for s0 in range(0, n, batch_size):
            cap_chunk = caps_j[s0:s0 + batch_size]
            m = cap_chunk.shape[0]
            if m < batch_size:
                cap_chunk = jnp.pad(cap_chunk, ((0, batch_size - m), (0, 0)))
            s = np.asarray(score_feat(variables, fi, cap_chunk))[:m]
            row.append(s)
        sims[i] = np.concatenate(row)

    cap_ids = np.asarray(cap_ids)
    labels = ((np.arange(n)[:, None] == np.arange(n)[None, :])
              | (cap_ids[:, None] == cap_ids[None, :])).astype(np.int32)
    return {"similarities": sims, "labels": labels}


def eval_retrieval(runner: TaskRunner, test_ds,
                   batch_size: int = 64) -> Dict:
    grid = score_grid(runner, test_ds, batch_size)
    return evaluate_retrieval(grid["similarities"], grid["labels"])
