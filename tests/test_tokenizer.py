"""WordPiece tokenizer parity vs HF BertTokenizer (slow, pure-Python path —
the one the reference actually uses, run_vqa.py:205-206)."""

import os

import pytest

from mvlt_tpu.text import WordPieceTokenizer, find_default_vocab

VOCAB = find_default_vocab()

pytestmark = pytest.mark.skipif(VOCAB is None, reason="no vocab.txt available")

SAMPLES = [
    "What modality is used to take this image? [END]",
    "the cardiac silhouette is enlarged. there are no focal consolidations .",
    "Is there evidence of pneumothorax or PLEURAL effusion?? [END]",
    "CT scan of the abdomen, showing a 3.5-cm mass (arrow).",
    "naïve café — résumé;  weird   spacing\tand\ttabs",
    "[CLS] already special [SEP] tokens [MASK] here [END]",
    "comparison:none. indication:chest pain history:___F",
    "x-ray reveals NO ACUTE cardiopulmonary abnormality!!!",
    "unadultered supercalifragilisticexpialidocious hyperfluorescence",
    "漢字 mixed with english and 日本語 text",
]


@pytest.fixture(scope="module")
def ours():
    return WordPieceTokenizer(VOCAB)


@pytest.fixture(scope="module")
def theirs():
    transformers = pytest.importorskip("transformers")
    tok = transformers.BertTokenizer.from_pretrained(os.path.dirname(VOCAB))
    tok.add_special_tokens({"eos_token": "[END]"})
    return tok


def test_vocab_size(ours, theirs):
    # The reference vocab.txt has [END] baked in at id 104 (it replaces
    # [unused99]), so add_special_tokens does NOT grow the vocab.
    assert len(ours) == len(theirs)


def test_special_token_ids(ours, theirs):
    assert ours.pad_token_id == 0
    assert ours.cls_token_id == 101
    assert ours.sep_token_id == 102
    assert ours.mask_token_id == 103
    assert ours.eos_token_id == theirs.convert_tokens_to_ids("[END]")


@pytest.mark.parametrize("text", SAMPLES)
def test_tokenize_parity(ours, theirs, text):
    assert ours.tokenize(text) == theirs.tokenize(text)


@pytest.mark.parametrize("text", SAMPLES)
def test_ids_parity(ours, theirs, text):
    ot = ours.convert_tokens_to_ids(ours.tokenize(text))
    ht = theirs.convert_tokens_to_ids(theirs.tokenize(text))
    assert ot == ht


def test_decode_stops_at_special(ours):
    ids = ours.encode("no acute findings [END] trailing garbage")
    text = ours.decode(ids)
    assert text == "no acute findings"


def test_roundtrip_subwords(ours):
    toks = ours.tokenize("hyperfluorescence")
    assert len(toks) > 1
    assert ours.decode_tokens(toks) == "hyperfluorescence"
