"""Metrics: golden-value equality vs the reference's pure-Python
pycocoevalcap scorers (imported from /root/reference as test oracles),
plus ranking/VQA/METEOR behavior tests."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from mvlt_tpu.metrics import (CaptionEvaluator, compute_ranks, compute_scores,
                              corpus_bleu, corpus_cider, corpus_meteor,
                              corpus_rouge_l, ptb_tokenize, recall_at_k,
                              vqa_accuracy)
from mvlt_tpu.metrics.porter import porter_stem

GTS = {
    0: ["the heart size is normal .", "cardiac silhouette within normal limits ."],
    1: ["no acute cardiopulmonary disease ."],
    2: ["there is a small left pleural effusion . lungs otherwise clear ."],
    3: ["both lungs are clear and expanded with no infiltrates ."],
}
RES = {
    0: ["the heart is normal in size ."],
    1: ["no acute cardiopulmonary abnormality ."],
    2: ["small left pleural effusion with clear lungs ."],
    3: ["both lungs are clear and expanded with no infiltrates ."],  # exact
}


@pytest.fixture(scope="module")
def reference_scorers():
    from pycocoevalcap.bleu.bleu import Bleu
    from pycocoevalcap.cider.cider import Cider
    from pycocoevalcap.rouge.rouge import Rouge
    return Bleu(4), Rouge(), Cider()


def test_bleu_matches_reference(reference_scorers):
    bleu_ref, _, _ = reference_scorers
    want, want_sents = bleu_ref.compute_score(GTS, RES)
    got, got_sents = corpus_bleu(GTS, RES)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    for k in range(4):
        np.testing.assert_allclose(got_sents[k], want_sents[k], rtol=1e-12)


def test_bleu_single_pair_matches_reference(reference_scorers):
    bleu_ref, _, _ = reference_scorers
    gts = {0: GTS[0]}
    res = {0: RES[0]}
    want, _ = bleu_ref.compute_score(gts, res)
    got, _ = corpus_bleu(gts, res)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_rouge_matches_reference(reference_scorers):
    _, rouge_ref, _ = reference_scorers
    want, want_sents = rouge_ref.compute_score(GTS, RES)
    got, got_sents = corpus_rouge_l(GTS, RES)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    np.testing.assert_allclose(got_sents, want_sents, rtol=1e-12)


def test_cider_matches_reference(reference_scorers):
    _, _, cider_ref = reference_scorers
    want, want_sents = cider_ref.compute_score(GTS, RES)
    got, got_sents = corpus_cider(GTS, RES)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    np.testing.assert_allclose(got_sents, want_sents, rtol=1e-10)


def test_fuzzed_parity_with_reference(reference_scorers):
    bleu_ref, rouge_ref, cider_ref = reference_scorers
    rng = np.random.default_rng(0)
    words = ["lung", "heart", "clear", "normal", "left", "right", "effusion",
             "small", "large", "acute", "disease", "silhouette", "is", "the",
             "no", "with", "."]
    for trial in range(5):
        gts, res = {}, {}
        for i in range(12):
            nref = int(rng.integers(1, 3))
            gts[i] = [" ".join(rng.choice(words, rng.integers(3, 15)))
                      for _ in range(nref)]
            res[i] = [" ".join(rng.choice(words, rng.integers(3, 15)))]
        np.testing.assert_allclose(corpus_bleu(gts, res)[0],
                                   bleu_ref.compute_score(gts, res)[0],
                                   rtol=1e-10)
        np.testing.assert_allclose(corpus_rouge_l(gts, res)[0],
                                   rouge_ref.compute_score(gts, res)[0],
                                   rtol=1e-10)
        np.testing.assert_allclose(corpus_cider(gts, res)[0],
                                   cider_ref.compute_score(gts, res)[0],
                                   rtol=1e-8)


def test_meteor_behavior():
    score, sents = corpus_meteor(GTS, RES)
    assert 0 < score < 1
    assert sents[3] > 0.95                 # exact match ≈ 1
    zero, _ = corpus_meteor({0: ["aaa bbb"]}, {0: ["ccc ddd"]})
    assert zero == 0.0
    # stem matching: 'expanding' aligns with 'expanded'
    s1, _ = corpus_meteor({0: ["the lungs expanded"]},
                          {0: ["the lungs expanding"]})
    s2, _ = corpus_meteor({0: ["the lungs expanded"]},
                          {0: ["the lungs shrank"]})
    assert s1 > s2


def test_meteor_synonym_stage_loadable(tmp_path, monkeypatch):
    """The synonym stage is data-only (MVLT_METEOR_SYNONYMS: one
    whitespace-separated synonym group per line).  With a group loaded,
    words sharing it align at module weight 0.8; without the table the
    stage is off (default)."""
    hyp = {0: ["the effusion is big"]}
    ref = {0: ["the effusion is large"]}
    off, _ = corpus_meteor(ref, hyp)
    syn = tmp_path / "syn.txt"
    syn.write_text("big large huge\nsmall tiny\n")
    monkeypatch.setenv("MVLT_METEOR_SYNONYMS", str(syn))
    on, _ = corpus_meteor(ref, hyp)
    monkeypatch.delenv("MVLT_METEOR_SYNONYMS")
    off2, _ = corpus_meteor(ref, hyp)
    assert on > off                       # synonym match raises the score
    assert off2 == off                    # unset -> stage off again
    # synonym weight sits below exact: identical sentence still wins
    exact, _ = corpus_meteor(ref, ref)
    assert exact > on


def test_porter_stemmer_known_values():
    cases = {"caresses": "caress", "ponies": "poni", "ties": "ti",
             "caress": "caress", "cats": "cat", "feed": "feed",
             "agreed": "agre", "plastered": "plaster", "bled": "bled",
             "motoring": "motor", "sing": "sing", "conflated": "conflat",
             "troubled": "troubl", "sized": "size", "hopping": "hop",
             "relational": "relat", "conditional": "condit",
             "rational": "ration", "valenci": "valenc",
             "effusions": "effus", "expanded": "expand",
             "expanding": "expand"}
    for word, want in cases.items():
        assert porter_stem(word) == want, (word, porter_stem(word), want)


def test_ptb_tokenize():
    assert ptb_tokenize("The heart is normal.") == "the heart is normal"
    assert ptb_tokenize("no acute disease , stable .") == "no acute disease stable"
    assert ptb_tokenize("it's (mildly) enlarged") == \
        "it 's -lrb- mildly -rrb- enlarged"   # brackets KEPT: the
    # reference filter lists "-LRB-" uppercase against lowercased output
    assert ptb_tokenize("don't worry; fine!") == "do n't worry fine"


def test_caption_evaluator_end_to_end():
    gt = ["the heart size is normal .", "no acute disease ."]
    pred = ["the heart size is normal .", "acute disease present ."]
    ev = CaptionEvaluator(gt, pred)
    out = ev.evaluate()
    assert set(out) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                        "ROUGE_L", "CIDEr"}
    assert out["Bleu_1"] > 0.5
    r2gen = compute_scores({0: [gt[0]], 1: [gt[1]]},
                           {0: [pred[0]], 1: [pred[1]]})
    assert set(r2gen) == {"BLEU_1", "BLEU_2", "BLEU_3", "BLEU_4", "METEOR",
                          "ROUGE_L", "CIDEr"}


def test_compute_ranks_reference_semantics():
    # 3x3 grid: diagonal true; image 0 also matches caption 2 (shared cap_id)
    labels = np.array([[1, 0, 1], [0, 1, 0], [0, 0, 1]])
    sims = np.array([[0.1, 0.9, 0.5],     # best match for img0 is cap1 (wrong)
                     [0.2, 0.8, 0.1],     # right away
                     [0.9, 0.5, 0.1]])    # correct at rank 2
    i2t, t2i = compute_ranks(sims, labels)
    assert i2t == [1, 0, 2]
    # t2i: columns; col0 labels [1,0,0], sims [0.1,0.2,0.9] -> ranks of img0: 2
    assert t2i == [2, 1, 0]
    accs = recall_at_k(i2t)
    assert accs["R@1"] == pytest.approx(1 / 3)
    assert accs["R@5"] == 1.0


def test_vqa_accuracy_split():
    preds = [0, 1, 2, 0, 1]
    labels = [0, 1, 0, -100, 1]
    types = ["OPEN", "CLOSED", "OPEN", "OPEN", "CLOSED"]
    out = vqa_accuracy(preds, labels, types)
    assert out["overall"] == pytest.approx(3 / 4)
    assert out["open"] == pytest.approx(1 / 2)
    assert out["closed"] == pytest.approx(1.0)


def test_meteor_alignment_properties():
    """Meteor's alignment resolution: maximize covered words, then
    minimize chunks, then minimize total distance (regression: the old
    greedy left-to-right scan violated all three)."""
    from mvlt_tpu.metrics.meteor import _align, _chunks

    # chunk minimization: 'b' must match the SECOND ref 'b' so the
    # alignment is one contiguous chunk (greedy picked the first)
    pairs = _align("a b".split(), "b a b".split())
    assert len(pairs) == 2 and _chunks(pairs) == 1

    # coverage maximization across repeated words
    pairs = _align("x x y".split(), "x y x".split())
    assert len(pairs) == 3

    # distance tie-break: identity alignment wins among equal-chunk options
    pairs = _align("w w".split(), "w w".split())
    assert [(i, j) for i, j, _ in pairs] == [(0, 0), (1, 1)]

    # stem matches rank below exact (module index 1)
    pairs = _align("expanding".split(), "expanded".split())
    assert pairs == [(0, 0, 1)]


def test_meteor_scoring_semantics():
    """Meteor 1.5 scoring semantics: identical segments (and corpora of
    them) score exactly 1.0; function words weigh less than content
    words (delta=0.75)."""
    s, _ = corpus_meteor({0: ["the heart size is normal"]},
                         {0: ["the heart size is normal"]})
    assert s == 1.0
    s, _ = corpus_meteor({0: ["a b c"], 1: ["d e"]},
                         {0: ["a b c"], 1: ["d e"]})
    assert s == 1.0
    # missing a content word hurts more than missing a function word
    content_miss, _ = corpus_meteor({0: ["the heart is enlarged"]},
                                    {0: ["the heart is"]})
    function_miss, _ = corpus_meteor({0: ["the heart is enlarged"]},
                                     {0: ["heart is enlarged"]})
    assert function_miss > content_miss
