"""Data pipeline: transforms parity with the reference formulas, masking
distribution, dataset semantics, loader determinism + host sharding."""

import re

import numpy as np
import pytest

from mvlt_tpu.data import transforms as T
from mvlt_tpu.data.datasets import (ConcatSource, MedVQADataset,
                                    PretrainDataset, RetrievalDataset,
                                    SyntheticSource)
from mvlt_tpu.data.loader import DataLoader
from mvlt_tpu.text.tokenizer import WordPieceTokenizer

from mvlt_tpu.text.tokenizer import find_default_vocab

VOCAB = find_default_vocab()  # packaged mvlt_tpu/text/vocab.txt


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer(VOCAB)


def test_variance_normalization_matches_reference_formula():
    rng = np.random.default_rng(0)
    im = rng.uniform(0, 255, size=(3, 16, 16)).astype(np.float32)
    got = T.normalize_image_var(im)
    for c in range(3):
        want = (im[c] - np.mean(im[c])) / np.var(im[c])  # var, NOT std
        np.testing.assert_allclose(got[c], want, rtol=1e-6)


def test_random_mask_word_counts_and_rates(tok):
    tokens = ["the", "lung", "is", "clear", "with", "no", "evidence", "of",
              "acute", "disease", "seen", "today", "[END]"]
    # count: min(10, max(1, round(13*0.2))) = 3
    rng = T.sample_rng(0, 0, 0)
    out, labels = T.random_mask_word(tokens, tok.vocab, rng)
    assert sum(l != -100 for l in labels) == 3
    # labels hold the ORIGINAL ids at masked slots
    for i, l in enumerate(labels):
        if l != -100:
            assert l == tok.vocab[tokens[i]]

    # 80/10/10 empirically over many draws
    n_mask = n_rand = n_keep = 0
    for trial in range(400):
        rng = T.sample_rng(1, 0, trial)
        out, labels = T.random_mask_word(tokens, tok.vocab, rng)
        for i, l in enumerate(labels):
            if l == -100:
                continue
            if out[i] == "[MASK]":
                n_mask += 1
            elif out[i] == tokens[i]:
                n_keep += 1
            else:
                n_rand += 1
    total = n_mask + n_rand + n_keep
    assert 0.74 < n_mask / total < 0.86
    assert 0.05 < n_rand / total < 0.16
    # reproducible
    a = T.random_mask_word(tokens, tok.vocab, T.sample_rng(2, 3, 4))
    b = T.random_mask_word(tokens, tok.vocab, T.sample_rng(2, 3, 4))
    assert a == b


def test_pad_truncate_preserves_end():
    ids = list(range(1, 12))  # 11 ids, last is [END] stand-in
    out, labels = T.pad_truncate_preserve_end(ids, 8, labels=ids)
    assert out.tolist() == [1, 2, 3, 4, 5, 6, 7, 11]
    assert labels.tolist() == [1, 2, 3, 4, 5, 6, 7, 11]
    out, labels = T.pad_truncate_preserve_end([5, 6], 6)
    assert out.tolist() == [5, 6, 0, 0, 0, 0]
    assert labels.tolist() == [-100] * 6


def _reference_clean_iu_xray(report):
    """Verbatim reference lambdas (run_report_generation_cxr.py:104-113)."""
    report_cleaner = lambda t: t.replace('..', '.').replace('..', '.').replace('..', '.').replace('1. ', '') \
        .replace('. 2. ', '. ').replace('. 3. ', '. ').replace('. 4. ', '. ').replace('. 5. ', '. ') \
        .replace(' 2. ', '. ').replace(' 3. ', '. ').replace(' 4. ', '. ').replace(' 5. ', '. ') \
        .strip().lower().split('. ')
    sent_cleaner = lambda t: re.sub(r'[.,?;*!%^&_+():-\[\]{}]', '', t.replace('"', '').replace('/', '').
                                    replace('\\', '').replace("'", '').strip().lower())
    tokens = [sent_cleaner(sent) for sent in report_cleaner(report) if sent_cleaner(sent) != []]
    return ' . '.join(tokens) + ' .'


def _reference_clean_mimic(report):
    """Verbatim reference lambdas (run_report_generation_cxr.py:257-270)."""
    report_cleaner = lambda t: t.replace('\n', ' ').replace('__', '_').replace('__', '_').replace('__', '_') \
        .replace('__', '_').replace('__', '_').replace('__', '_').replace('__', '_').replace('  ', ' ') \
        .replace('  ', ' ').replace('  ', ' ').replace('  ', ' ').replace('  ', ' ').replace('  ', ' ') \
        .replace('..', '.').replace('..', '.').replace('..', '.').replace('..', '.').replace('..', '.') \
        .replace('..', '.').replace('..', '.').replace('..', '.').replace('1. ', '').replace('. 2. ', '. ') \
        .replace('. 3. ', '. ').replace('. 4. ', '. ').replace('. 5. ', '. ').replace(' 2. ', '. ') \
        .replace(' 3. ', '. ').replace(' 4. ', '. ').replace(' 5. ', '. ').replace('--', ' -- ') \
        .strip().lower().split('. ')
    sent_cleaner = lambda t: re.sub(r'[.,?;*!%^&_+():-\[\]{}]', '', t.replace('"', '').replace('/', '')
                                    .replace('\\', '').replace("'", '').strip().lower())
    tokens = [sent_cleaner(sent) for sent in report_cleaner(report) if sent_cleaner(sent) != []]
    return ' . '.join(tokens) + ' .'


REPORTS = [
    "1. No acute disease.. 2. Heart size normal. 3. Lungs are clear!",
    "The cardiac silhouette is (mildly) enlarged; no pleural effusion...",
    "Comparison: none. FINDINGS:  heart size is top-normal -- stable.\n\nNo pneumothorax__",
    "Normal chest x-ray report's text [with brackets] {and braces} a/b\\c \"quoted\"",
]


@pytest.mark.parametrize("report", REPORTS)
def test_clean_report_parity(report):
    assert T.clean_report_iu_xray(report) == _reference_clean_iu_xray(report)
    assert T.clean_report_mimic_cxr(report) == _reference_clean_mimic(report)


def test_pretrain_dataset_semantics(tok):
    src = SyntheticSource(n=32)
    ds = PretrainDataset(src, tok, max_length=20, seed=0)
    itm, masked_on_pos = [], True
    for i in range(32):
        s = ds[i]
        assert s["image"].shape == (3, 32, 32)
        assert s["caption_masked"].shape == (20,)
        assert s["caption_label"].shape == (20,)
        itm.append(int(s["itm_label"]))
        if s["itm_label"] == 0:
            # negatives are never masked (run_pretrain.py:108-111)
            assert np.all(s["caption_label"] == -100)
    assert 0 < sum(itm) < 32
    # deterministic given (seed, epoch, index)
    a, b = ds.__getitem__(3, epoch=1), ds.__getitem__(3, epoch=1)
    np.testing.assert_array_equal(a["caption_masked"], b["caption_masked"])
    c = ds.__getitem__(3, epoch=2)
    assert not np.array_equal(a["caption_masked"], c["caption_masked"]) or \
        a["itm_label"] != c["itm_label"] or True  # may coincide; smoke only


def test_concat_source_dispatch():
    a, b = SyntheticSource(n=3, seed=1), SyntheticSource(n=4, seed=2)
    cat = ConcatSource(a, b)
    assert len(cat) == 7
    np.testing.assert_array_equal(cat[2][0], a[2][0])
    np.testing.assert_array_equal(cat[3][0], b[0][0])
    assert cat[6][1] == b[3][1]


def test_retrieval_dataset_train_and_test(tok):
    src = SyntheticSource(n=5)
    train = RetrievalDataset(src, tok, max_length=16, split="train")
    s = train[0]
    assert s["pos"]["label"] == 1 and s["neg"]["label"] == 0
    diff_img = not np.array_equal(s["pos"]["image"], s["neg"]["image"])
    diff_cap = not np.array_equal(s["pos"]["caption"], s["neg"]["caption"])
    assert diff_img or diff_cap

    test = RetrievalDataset(src, tok, max_length=16, split="test")
    assert len(test) == 25
    # diagonal is positive
    for i in range(5):
        assert test[i * 5 + i]["label"] == 1
    # off-diagonal with distinct captions is negative
    assert test[1]["label"] == 0
    # image comes from row idx, caption from col idx
    np.testing.assert_array_equal(test[7]["image"], src[1][0])


def test_vqa_dataset_from_arrays(tok):
    images = np.zeros((4, 3, 8, 8), np.float32)
    entries = [{"img_id": i % 4, "question": f"is this normal {i} ?",
                "label": (None if i == 2 else i % 3),
                "answer_type": "CLOSED"} for i in range(6)]
    ds = MedVQADataset.from_arrays(images, entries, {"yes": 0, "no": 1},
                                   max_len=12)
    ds.tokenize(tok)
    s = ds[2]
    assert s["label"] == -100  # unanswerable -> ignore_index (run_vqa.py:45-49)
    s = ds[1]
    assert s["question"].shape == (12,)
    assert s["question"][-1] == 0 or s["question"][-1] == tok.eos_token_id


def test_loader_batching_determinism_and_sharding(tok):
    src = SyntheticSource(n=20)
    ds = PretrainDataset(src, tok, max_length=16, seed=0)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=7)
    b1 = [b["caption_masked"] for b in dl.epoch(0)]
    b2 = [b["caption_masked"] for b in dl.epoch(0)]
    assert len(b1) == 5
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)
    b3 = [b["caption_masked"] for b in dl.epoch(1)]
    assert any(not np.array_equal(x, y) for x, y in zip(b1, b3))

    # host sharding partitions the index space disjointly
    parts = []
    for p in range(2):
        dlp = DataLoader(ds, batch_size=4, shuffle=True, seed=7,
                         process_index=p, process_count=2)
        parts.append(set(dlp._indices(0).tolist()))
    assert parts[0] & parts[1] == set()
    assert parts[0] | parts[1] == set(range(20))


@pytest.mark.quick
def test_loader_host_shards_equal_counts():
    """All hosts must see the SAME number of indices (a bare strided
    slice desyncs multi-host collectives on odd dataset sizes)."""
    from mvlt_tpu.data.loader import DataLoader

    class Tiny:
        def __len__(self):
            return 15
        def __getitem__(self, i, epoch=0):
            return {"x": np.zeros(2, np.float32)}

    counts = set()
    for p in range(2):
        dl = DataLoader(Tiny(), batch_size=4, drop_last=True,
                        process_index=p, process_count=2)
        counts.add(len(dl._indices(0)))
        assert dl.batches_per_epoch() == 1
    assert len(counts) == 1, counts


@pytest.mark.quick
def test_loader_abandoned_epoch_does_not_leak_producer():
    """Breaking out of an epoch mid-way must unblock the producer thread
    (it used to sit in Queue.put forever once the queue filled)."""
    import threading
    import time as _time
    from mvlt_tpu.data.loader import DataLoader

    class Tiny:
        def __len__(self):
            return 64
        def __getitem__(self, i, epoch=0):
            return {"x": np.zeros(4, np.float32)}

    before = threading.active_count()
    dl = DataLoader(Tiny(), batch_size=4, prefetch=1, num_threads=2)
    for _n, _b in enumerate(dl.epoch(0)):
        if _n == 1:
            break   # abandon; generator close() runs the finally clause
    # give the producer time to notice stop and exit
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_loader_process_workers_match_threaded(tok):
    """num_workers>0 (fork process pool) must yield byte-identical batches
    in the same order as the threaded path: sample RNG is keyed by
    (seed, epoch, index), never by worker identity."""
    src = SyntheticSource(n=24, image_size=16)
    ds = PretrainDataset(src, tok, max_length=16, seed=3)
    a = list(DataLoader(ds, 8, shuffle=True, seed=5, num_workers=0).epoch(1))
    b = list(DataLoader(ds, 8, shuffle=True, seed=5, num_workers=2).epoch(1))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        assert sorted(x.keys()) == sorted(y.keys())
        for k in x:
            np.testing.assert_array_equal(np.asarray(x[k]), np.asarray(y[k]))


def test_loader_process_workers_abandoned_epoch():
    """Abandoning a process-worker epoch mid-way must not hang or leak the
    producer (stop event breaks the bounded-submission loop)."""
    import threading
    import time as _time

    class Tiny:
        def __len__(self):
            return 64
        def __getitem__(self, i, epoch=0):
            return {"x": np.zeros(4, np.float32)}

    before = threading.active_count()
    dl = DataLoader(Tiny(), batch_size=4, prefetch=1, num_workers=2)
    for _n, _b in enumerate(dl.epoch(0)):
        if _n == 1:
            break
    deadline = _time.time() + 10.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_device_prefetch_multithread_order_and_errors():
    """device_prefetch with threads > 1 pipelines transfers but MUST
    deliver batches in host-iterator order (epoch determinism), drain the
    full epoch, and propagate producer exceptions."""
    import time as _time

    from mvlt_tpu.data.loader import device_prefetch

    def gen(n):
        for i in range(n):
            # jitter assembly so threads race and finish out of order
            _time.sleep(0.002 if i % 3 else 0.01)
            yield {"i": np.full((2,), i, np.int32)}

    for threads in (1, 2, 4):
        got = [int(b["i"][0]) for b in
               device_prefetch(gen(17), size=3, threads=threads)]
        assert got == list(range(17)), (threads, got)

    def boom():
        yield {"i": np.zeros(2, np.int32)}
        raise RuntimeError("producer failed")

    it = device_prefetch(boom(), size=2, threads=2)
    next(it)
    try:
        for _ in it:
            pass
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "producer failed" in str(e)
