"""METEOR (exact + Porter-stem matching), Java-free.

The reference drives ``meteor-1.5.jar`` over a stdio line protocol
(``pycocoevalcap/meteor/meteor.py:17-58``).  This is a native
reimplementation of the METEOR algorithm with the *exact* and *stem*
modules; the *synonym*/*paraphrase* modules require WordNet and the
paraphrase tables embedded in the jar, which are unavailable offline —
scores therefore lower-bound meteor-1.5 (documented deviation; BLEU /
ROUGE-L / CIDEr are the exactly-matched metrics).

Scoring follows the original METEOR formulation (Banerjee & Lavie 2005):
Fmean = P*R / (alpha*P + (1-alpha)*R) with alpha=0.9, fragmentation
penalty gamma * (chunks/matches)^beta with gamma=0.5, beta=3 (identical
sentences score ~1).  Corpus score aggregates segment statistics
(micro-average), like the jar's final score.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from mvlt_tpu.metrics.porter import porter_stem

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int]]:
    """Stage-wise greedy alignment: exact first, then stem, each stage
    matching left-to-right in a monotonic-preferring order."""
    matched_h = [False] * len(hyp)
    matched_r = [False] * len(ref)
    pairs: List[Tuple[int, int]] = []

    def stage(key_h, key_r):
        for i, h in enumerate(hyp):
            if matched_h[i]:
                continue
            kh = key_h(h)
            for j, r in enumerate(ref):
                if not matched_r[j] and kh == key_r(r):
                    matched_h[i] = matched_r[j] = True
                    pairs.append((i, j))
                    break

    stage(lambda w: w, lambda w: w)                       # exact
    stage(porter_stem, porter_stem)                       # stem
    return sorted(pairs)


def _chunks(pairs: List[Tuple[int, int]]) -> int:
    if not pairs:
        return 0
    chunks = 1
    for (i0, j0), (i1, j1) in zip(pairs, pairs[1:]):
        if i1 != i0 + 1 or j1 != j0 + 1:
            chunks += 1
    return chunks


def _segment_stats(hyp: str, refs: List[str]):
    """Best (by score) reference's (m, len_h, len_r, chunks)."""
    h = hyp.split()
    best = None
    for ref in refs:
        r = ref.split()
        pairs = _align(h, r)
        m = len(pairs)
        ch = _chunks(pairs)
        stats = (m, len(h), len(r), ch)
        if best is None or _score_from_stats(*stats) > _score_from_stats(*best):
            best = stats
    return best


def _score_from_stats(m: int, len_h: int, len_r: int, chunks: int) -> float:
    if m == 0 or len_h == 0 or len_r == 0:
        return 0.0
    p = m / len_h
    r = m / len_r
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    frag = chunks / m
    return fmean * (1 - GAMMA * frag ** BETA)


def corpus_meteor(gts: Dict, res: Dict) -> Tuple[float, List[float]]:
    assert gts.keys() == res.keys()
    scores = []
    tot_m = tot_h = tot_r = tot_ch = 0
    for i in gts.keys():
        m, lh, lr, ch = _segment_stats(res[i][0], gts[i])
        scores.append(_score_from_stats(m, lh, lr, ch))
        tot_m += m
        tot_h += lh
        tot_r += lr
        tot_ch += ch
    return _score_from_stats(tot_m, tot_h, tot_r, tot_ch), scores
