"""PTB tokenization for the metric path — a native reimplementation of the
reference's Java pipeline (``pycocoevalcap/tokenizer/ptbtokenizer.py``:
Stanford ``PTBTokenizer -preserveLines -lowerCase`` via subprocess, then a
punctuation-strip list).  No Java in this framework.

Covers the PTB rules that can occur in this project's caption streams
(cleaned, lowercased medical reports — see ``transforms.clean_report_*``):
punctuation splitting, contractions, bracket normalization, quote
normalization, ellipses.  The post-tokenization punctuation removal list is
verbatim from the reference (ptbtokenizer.py:21-22).
"""

from __future__ import annotations

import re
from typing import Dict, List

PUNCTUATIONS = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                ".", "?", "!", ",", ":", "-", "--", "...", ";"]
_PUNC_SET = set(PUNCTUATIONS)

_BRACKETS = {"(": "-LRB-", ")": "-RRB-", "[": "-LSB-", "]": "-RSB-",
             "{": "-LCB-", "}": "-RCB-"}

_CONTRACTIONS = re.compile(
    r"(?i)(n't|'ll|'re|'ve|'s|'m|'d)\b")


def _ptb_tokenize_line(text: str) -> List[str]:
    t = text
    # normalize quotes: opening " after space/start -> ``, closing -> ''
    t = re.sub(r'(^|[ \(\[{<])"', r"\1 `` ", t)
    t = t.replace('"', " '' ")
    # ellipsis
    t = t.replace("...", " ... ")
    # brackets
    for k, v in _BRACKETS.items():
        t = t.replace(k, f" {v} ")
    # separate standard punctuation
    t = re.sub(r"([;@#$%&?!])", r" \1 ", t)
    t = re.sub(r"([^\d]),", r"\1 , ", t)       # commas not inside numbers
    t = re.sub(r",([^\d])", r" , \1", t)
    t = re.sub(r"([^:\d]):", r"\1 : ", t)      # colons not inside times
    t = t.replace(" - ", " -- ").replace("--", " -- ")
    # periods: split when not part of an abbreviation-like token
    t = re.sub(r"\.(\s|$)", r" . \1", t)
    # contractions
    t = _CONTRACTIONS.sub(r" \1", t)
    # possessive plural: dogs' -> dogs '
    t = re.sub(r"(\w)' ", r"\1 ' ", t)
    return t.lower().split()


def ptb_tokenize(text: str) -> str:
    """Tokenize one caption and drop the reference's punctuation list.
    Uses the native C++ tokenizer (csrc/ptb.cc) when built; byte-exact
    Python fallback otherwise."""
    try:
        from mvlt_tpu.text.native import ptb_tokenize_native
        native = ptb_tokenize_native(text)
        if native is not None:
            return native
    except Exception:
        pass
    return ptb_tokenize_py(text)


def ptb_tokenize_py(text: str) -> str:
    return " ".join(w for w in _ptb_tokenize_line(text)
                    if w not in _PUNC_SET and w.upper() not in _PUNC_SET)


def ptb_tokenize_corpus(captions_for_image: Dict) -> Dict[object, List[str]]:
    """Reference-shaped API: {id: [{'caption': str}, ...]} ->
    {id: [tokenized_str, ...]} (ptbtokenizer.py:28-74)."""
    out: Dict[object, List[str]] = {}
    for k, v in captions_for_image.items():
        caps = [d["caption"] if isinstance(d, dict) else d for d in v]
        out[k] = [ptb_tokenize(c) for c in caps]
    return out
