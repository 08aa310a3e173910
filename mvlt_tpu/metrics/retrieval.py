"""Retrieval ranking metrics (reference ``run_retrieval.py:220-295``).

The NxN score grid comes straight from the batched ITM scorer (one
``vmap``-ed model sweep in ``mvlt_tpu.tasks.retrieval``), replacing the
reference's per-pair Dataset enumeration.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def compute_ranks(similarities: np.ndarray, labels: np.ndarray
                  ) -> Tuple[List[int], List[int]]:
    """similarities/labels: (N, N) with rows = images, cols = captions.
    Rank = position of the first correct item in the score-descending
    order; N if none (run_retrieval.py:220-249)."""
    n = similarities.shape[1]

    def ranks(sim, lab):
        out = []
        order = np.argsort(-sim, axis=1, kind="stable")
        for row_lab, row_ord in zip(lab, order):
            hit = np.nonzero(row_lab[row_ord] == 1)[0]
            out.append(int(hit[0]) if hit.size else n)
        return out

    i2t = ranks(similarities, labels)
    t2i = ranks(similarities.T, labels.T)
    return i2t, t2i


def recall_at_k(ranks: Sequence[int], ks: Sequence[int] = (1, 5, 10)
                ) -> Dict[str, float]:
    return {f"R@{k}": sum(r < k for r in ranks) / len(ranks) for k in ks}


def evaluate_retrieval(similarities: np.ndarray, labels: np.ndarray) -> Dict:
    """Full eval result (run_retrieval.py:286-295)."""
    i2t, t2i = compute_ranks(np.asarray(similarities), np.asarray(labels))
    return {"i2t_retrieval": recall_at_k(i2t),
            "t2i_retrieval": recall_at_k(t2i)}
