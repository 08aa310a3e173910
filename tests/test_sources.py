"""On-disk source integration: ROCO folder scan + cache, MedICaT json,
multi-reference caption evaluation."""

import json
import os

import numpy as np
import pytest

from mvlt_tpu.data.datasets import ImageFolderSource
from mvlt_tpu.metrics import CaptionEvaluator

PIL = pytest.importorskip("PIL")
from PIL import Image


def _write_img(path, seed=0, size=20):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (size, size, 3), np.uint8)).save(path)


def test_roco_scan_cache_and_load(tmp_path):
    base = tmp_path / "train" / "radiology"
    (base / "images").mkdir(parents=True)
    lines = []
    for i in range(3):
        name = f"ROCO_{i:05d}"
        _write_img(base / "images" / f"{name}.jpg", seed=i)
        lines.append(f"{name}\tcaption number {i}")
    lines.append("ROCO_99999\tmissing image")  # skipped with warning
    (base / "captions.txt").write_text("\n".join(lines))

    src = ImageFolderSource.from_roco(str(tmp_path), "train")
    assert len(src) == 3
    im, caption, _, _ = src[1]
    assert im.shape == (3, 224, 224)
    assert caption == "caption number 1"
    # channel variance-normalized
    assert abs(float(im[0].mean())) < 1e-4

    # cache json written and reused
    assert (base / "ROCO.json").exists()
    src2 = ImageFolderSource.from_roco(str(tmp_path), "train")
    assert len(src2) == 3


def test_medicat_source(tmp_path):
    (tmp_path / "figures").mkdir()
    data = []
    for i in range(2):
        name = f"hash{i}_fig{i}.jpg"
        _write_img(tmp_path / "figures" / name, seed=i)
        data.append({"pdf_hash": f"hash{i}", "fig_uri": f"fig{i}.jpg",
                     "s2_caption": f"medicat caption {i}"})
    (tmp_path / "medicat.json").write_text(json.dumps(data))
    src = ImageFolderSource.from_medicat(str(tmp_path))
    assert len(src) == 2
    im, caption, _, _ = src[0]
    assert im.shape == (3, 224, 224)
    assert caption == "medicat caption 0"


def test_multi_reference_caption_eval():
    gt = [["the heart is normal .", "cardiac size is normal ."],
          ["no acute disease ."]]
    pred = ["the heart is normal .", "no disease ."]
    out = CaptionEvaluator(gt, pred, include_meteor=False).evaluate()
    assert out["Bleu_1"] > 0.5
    single = CaptionEvaluator([g[0] for g in gt], pred,
                              include_meteor=False).evaluate()
    # extra references can only help BLEU here
    assert out["Bleu_1"] >= single["Bleu_1"] - 1e-9
