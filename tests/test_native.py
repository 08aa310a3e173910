"""Native C++ tokenizer: byte-exact parity with the Python WordPiece path
(and, transitively, with HF BertTokenizer — see test_tokenizer.py)."""

import os
import subprocess

import pytest

from mvlt_tpu.text.tokenizer import WordPieceTokenizer

VOCAB = "/root/reference/dataset/bert-base-uncased/vocab.txt"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "mvlt_tpu", "_native", "libmvlt_native.so")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not os.path.exists(LIB):
        subprocess.run(["make", "-C", os.path.join(REPO, "csrc")], check=True)


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer(VOCAB)


SENTENCES = [
    "the heart size is normal .",
    "is there a nodule in the right lung ? [END]",
    "No Acute Cardiopulmonary Disease!!",
    "there is a small left-sided pleural effusion, stable.",
    "findings: 1. unremarkable mediastinum; 2. clear lungs [SEP] done",
    "x-ray shows q.r.s. abnormality w/ 5% change (mild)",
    "supercalifragilisticexpialidocious pneumonoultramicroscopicsilicovolcanoconiosis",
    "[CLS] hello [MASK] world [END]",
    "",
    "a",
]


def test_native_matches_python(tok):
    from mvlt_tpu.text.native import NativeWordPiece
    native = NativeWordPiece(VOCAB)
    for s in SENTENCES:
        want = tok.convert_tokens_to_ids(tok.tokenize(s))
        got = native.encode(s)
        assert got == want, (s, got, want)


def test_encode_uses_native_and_agrees(tok):
    assert tok._native is not None, "native lib should have been built"
    for s in SENTENCES:
        assert tok.encode(s) == tok.convert_tokens_to_ids(tok.tokenize(s))


def test_non_ascii_falls_back(tok):
    s = "café naïve résumé"
    assert tok.encode(s) == tok.convert_tokens_to_ids(tok.tokenize(s))


def test_native_vocab_size(tok):
    assert tok._native.vocab_size() == len(tok)


def test_ptb_native_matches_python():
    from mvlt_tpu.metrics.ptb import ptb_tokenize_py
    from mvlt_tpu.text.native import ptb_tokenize_native

    cases = [
        "The heart is normal.",
        "no acute disease , stable .",
        "it's (mildly) enlarged",
        "don't worry; fine!",
        "values: 1,234 and 5,6 and x,y -- done...",
        'he said "stop" and left',
        "patients' records can't be found; we'll re-check",
        "q.r.s. wave at 3:45 vs 12:30:15",
        "",
        "a-b c - d e--f",
    ]
    import numpy as np
    rng = np.random.default_rng(0)
    words = ["lung", "heart", "it's", "don't", "x-ray", "(left)", "5,000",
             "3:45", "...", "--", "stable.", '"quote"', "clear,", "end"]
    for _ in range(60):
        cases.append(" ".join(rng.choice(words, rng.integers(1, 10))))
    for s in cases:
        got = ptb_tokenize_native(s)
        assert got is not None
        assert got == ptb_tokenize_py(s), (s, got, ptb_tokenize_py(s))
