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


def test_u8_cache_matches_folder_source(tmp_path):
    """U8CacheSource must reproduce the on-the-fly device-normalize path
    bit-for-bit: same uint8 pixels, same captions, and an identical
    PretrainDataset sample stream (incl. the ITM rng draw order)."""
    from mvlt_tpu.data.datasets import PretrainDataset, U8CacheSource
    from mvlt_tpu.data.preprocess import build_u8_cache
    from mvlt_tpu.text.tokenizer import (WordPieceTokenizer,
                                         synthetic_vocab_file)

    items = []
    for i in range(6):
        p = tmp_path / f"im{i}.jpg"
        _write_img(p, seed=i, size=64)
        items.append((str(p), f"finding number {i} in the left lung"))

    live = ImageFolderSource(items, image_size=224, normalize="device")
    cache = U8CacheSource(build_u8_cache(items, str(tmp_path / "cache"),
                                         image_size=224))
    assert len(cache) == len(live) == 6
    for i in range(6):
        im_l, cap_l, _, _ = live[i]
        im_c, cap_c, _, _ = cache[i]
        assert im_c.dtype == np.uint8 and im_c.shape == (224, 224, 3)
        np.testing.assert_array_equal(im_c, im_l)
        assert cap_c == cap_l
    # peek never touches the memmap payload
    assert cache.peek(2)[0] == items[2][1]

    tok = WordPieceTokenizer(synthetic_vocab_file())
    ds_l = PretrainDataset(live, tok, max_length=32, seed=3)
    ds_c = PretrainDataset(cache, tok, max_length=32, seed=3)
    for i in range(6):
        a, b = ds_l.__getitem__(i, epoch=1), ds_c.__getitem__(i, epoch=1)
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["caption_masked"],
                                      b["caption_masked"])
        np.testing.assert_array_equal(a["caption_label"],
                                      b["caption_label"])
        assert a["itm_label"] == b["itm_label"]


def test_u8_cache_two_view(tmp_path):
    from mvlt_tpu.data.datasets import U8CacheSource
    from mvlt_tpu.data.preprocess import build_u8_cache

    items = []
    for i in range(3):
        p0, p1 = tmp_path / f"a{i}.jpg", tmp_path / f"b{i}.jpg"
        _write_img(p0, seed=2 * i, size=48)
        _write_img(p1, seed=2 * i + 1, size=48)
        items.append(([str(p0), str(p1)], f"two view report {i}"))
    cache = U8CacheSource(build_u8_cache(items, str(tmp_path / "c2"),
                                         image_size=224,
                                         img_ids=["x", "y", "z"],
                                         cap_ids=["x", "y", "z"]))
    im, cap, img_id, cap_id = cache[1]
    assert im.shape == (2, 224, 224, 3) and im.dtype == np.uint8
    assert cap == "two view report 1" and img_id == "y" == cap_id


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
