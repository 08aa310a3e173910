"""Preprocessing: RGC pickle format roundtrip through PickleSource, and
VQA-RAD question cleanup parity with the reference's replace chain."""

import json
import os
import pickle

import numpy as np
import pytest

from mvlt_tpu.data.datasets import PickleSource
from mvlt_tpu.data.preprocess import (clean_rad_question, preprocess_rgc,
                                      preprocess_vqa_text)


def test_clean_rad_question_reference_parity():
    # reference chain (preprocess_VQA.py:220-233)
    def ref(question):
        s = question.lower()
        for pat in ("? -yes/no", "? -open", "? - open"):
            if pat in s:
                s = s.replace(pat, "")
        return (s.replace(',', '').replace('?', '').replace("'s", " 's")
                .replace('...', '').replace('x ray', 'x-ray').replace('.', ''))

    qs = ["Is there a fracture? -yes/no",
          "What's visible in the x ray? - open",
          "Are the lungs clear, or not?...",
          "IS THE PATIENT'S HEART ENLARGED? -open"]
    for q in qs:
        assert clean_rad_question(q) == ref(q)


def test_preprocess_rgc_roundtrip(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    root = tmp_path / "RGC"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    ann = {"train": [], "test": []}
    for split, n in (("train", 3), ("test", 2)):
        for i in range(n):
            name = f"{split}_{i}.png"
            arr = rng.integers(0, 255, (32, 40), np.uint8)  # grayscale
            Image.fromarray(arr, "L").save(root / "images" / name)
            ann[split].append({"image": name, "img_id": i,
                               "caption": f"{split} caption {i}",
                               "cap_id": 100 + i})
    with open(root / "RGC_annotation.json", "w") as f:
        json.dump(ann, f)

    preprocess_rgc(str(root), image_size=16)

    src = PickleSource(str(root / "train" / "train_img_idx2path.pkl"))
    assert len(src) == 3
    im, caption, img_id, cap_id = src[1]
    assert im.shape == (3, 16, 16)
    assert caption == "train caption 1"
    assert cap_id == 101
    # variance normalization applied (channel means ~0)
    assert abs(float(im[0].mean())) < 1e-4


def test_preprocess_vqa_text_slake_format(tmp_path):
    data_root = tmp_path
    base = data_root / "SLAKE" / "combine"
    base.mkdir(parents=True)
    ans2label = {"yes": 0, "no": 1, "lung": 2}
    with open(base / "en_ans2label.pkl", "wb") as f:
        pickle.dump(ans2label, f)
    with open(base / "en_label2ans.pkl", "wb") as f:
        pickle.dump(["yes", "no", "lung"], f)
    for split, tname in (("train", "en_train_target.pkl"),
                         ("validate", "en_validate_target.pkl"),
                         ("test", "en_test_target.pkl")):
        qa = [{"qid": 1, "question": "is it normal?", "img_id": 7,
               "answer_type": "CLOSED", "q_lang": "en", "answer": "yes"},
              {"qid": 2, "question": "好吗?", "img_id": 7,
               "answer_type": "CLOSED", "q_lang": "zh", "answer": "yes"},
              {"qid": 3, "question": "which organ?", "img_id": 8,
               "answer_type": "OPEN", "q_lang": "en", "answer": "???"}]
        with open(data_root / "SLAKE" / f"question_{split}.json", "w") as f:
            json.dump(qa, f)
        targets = [{"qid": 1, "labels": [0]}, {"qid": 2, "labels": [0]},
                   {"qid": 3, "labels": []}]
        with open(base / tname, "wb") as f:
            pickle.dump(targets, f)

    out = preprocess_vqa_text(str(data_root), "SLAKE")
    with open(out, "rb") as f:
        entries, a2l, l2a = pickle.load(f)
    assert a2l == ans2label
    # zh question filtered; unanswerable got label None
    assert len(entries["train"]) == 2
    assert entries["train"][0]["label"] == 0
    assert entries["train"][1]["label"] is None
    assert entries["train"][1]["answer_type"] == "OPEN"
