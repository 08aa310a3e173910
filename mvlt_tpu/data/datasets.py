"""Per-task datasets over the reference's on-disk formats.

All datasets are index-addressable and take an explicit per-sample
``np.random.Generator`` (keyed by seed/epoch/index via
``transforms.sample_rng``) instead of the reference's global ``random``.

Sources of truth in the reference:
- pretrain pickles:  ``[im_np, caption, img_id, cap_id]`` per sample +
  ``{idx: path}`` index (``preprocess_rgc.py:44-50``; consumed by
  ``run_pretrain.py:16-158``)
- ROCO: ``<root>/<split>/radiology/{images,captions.txt}`` scanned into a
  json cache (``run_pretrain_rgc_roco_medicat.py:34-77``)
- MedICaT: ``medicat.json`` list with pdf_hash/fig_uri/s2_caption
  (``run_pretrain_rgc_roco_medicat.py:80-87, 113-129``)
- VQA pickles: image bank ``(img_id2idx, idx2img_id, img_list_in_np)`` +
  text ``(entries, ans2label, label2ans)`` (``run_vqa.py:17-72``)
- IU X-Ray / MIMIC-CXR: ``annotation.json`` + image dirs
  (``run_report_generation_cxr.py:79-270``)
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mvlt_tpu.data import transforms as T


# ---------------------------------------------------------------------------
# sample sources (image, caption, img_id, cap_id)
# ---------------------------------------------------------------------------

class PickleSource:
    """RGC-style per-sample pickles behind an ``{idx: path}`` index
    (run_pretrain.py:16-37)."""

    def __init__(self, index_path: str):
        with open(index_path, "rb") as f:
            self.idx2path = pickle.load(f)
        self._cache: Optional[list] = None
        self._peek_cache: dict = {}

    def __len__(self):
        return len(self.idx2path)

    def cache_in_memory(self):
        """run_pretrain.py save_data_in_cache (35-59)."""
        self._cache = [self._load(i) for i in range(len(self))]

    def _load(self, index: int):
        with open(self.idx2path[index], "rb") as f:
            im_np, caption, img_id, cap_id = pickle.load(f)
        return np.asarray(im_np, np.float32), caption, img_id, cap_id

    def __getitem__(self, index: int):
        if self._cache is not None:
            return self._cache[index]
        return self._load(index)

    def peek(self, index: int):
        """(caption, cap_id) — per-index caption cache so repeated
        negative-sampling probes don't re-unpickle the image payload."""
        if self._cache is not None:
            _, caption, _, cap_id = self._cache[index]
            return caption, cap_id
        hit = self._peek_cache.get(index)
        if hit is None:
            _, caption, _, cap_id = self._load(index)
            hit = self._peek_cache[index] = (caption, cap_id)
        return hit


class ImageFolderSource:
    """(path, caption) pairs decoded + variance-normalized on the fly
    (ROCO / MedICaT pattern, run_pretrain_rgc_roco_medicat.py:99-129)."""

    def __init__(self, items: Sequence[Tuple[str, str]], image_size: int = 224,
                 fast_decode: bool = False, normalize: str = "host"):
        self.items = list(items)
        self.image_size = image_size
        self.fast_decode = fast_decode
        # "host": float32 CHW variance-normalized on the host (bit-parity
        # with the reference numpy chain); "device": uint8 HWC, normalized
        # inside the jitted model (device_var_normalize) — ~1.8x cheaper
        # per host core and 4x fewer host->HBM bytes.
        self.normalize = normalize

    @staticmethod
    def from_roco(root: str, split: str = "train") -> "ImageFolderSource":
        """Scan ``<root>/<split>/radiology/captions.txt`` with a json cache
        and image-exists check (run_pretrain_rgc_roco_medicat.py:34-77)."""
        base = os.path.join(root, split, "radiology")
        cache = os.path.join(base, "ROCO.json")
        if os.path.exists(cache):
            with open(cache) as f:
                items = [tuple(x) for x in json.load(f)]
            return ImageFolderSource(items)
        items = []
        skipped = 0
        with open(os.path.join(base, "captions.txt")) as f:
            for line in f:
                parts = line.strip().split("\t", 1)
                if len(parts) != 2:
                    continue
                name, caption = parts
                path = os.path.join(base, "images", name + ".jpg")
                # validity check with logged skip — the reference's only
                # fault tolerance (run_pretrain_rgc_roco_medicat.py:58-62)
                if os.path.exists(path):
                    items.append((path, caption))
                else:
                    skipped += 1
        if skipped:
            import logging
            logging.getLogger("mvlt.data").warning(
                "ROCO scan: skipped %d entries with missing images", skipped)
        with open(cache, "w") as f:
            json.dump(items, f)
        return ImageFolderSource(items)

    @staticmethod
    def from_medicat(root: str) -> "ImageFolderSource":
        with open(os.path.join(root, "medicat.json")) as f:
            data = json.load(f)
        items = [(os.path.join(root, "figures",
                               d["pdf_hash"] + "_" + d["fig_uri"]),
                  d["s2_caption"]) for d in data]
        return ImageFolderSource(items)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int):
        path, caption = self.items[index]
        if self.normalize == "device":
            im = T.load_image_u8(path, self.image_size,
                                 fast=self.fast_decode)
        else:
            im = T.load_image_var_normalized(path, self.image_size,
                                             fast=self.fast_decode)
        return im, caption, index, (path, caption[:64])

    def peek(self, index: int):
        """(caption, cap_id) WITHOUT decoding the image — negative
        sampling probes captions only (see ``PretrainDataset``)."""
        path, caption = self.items[index]
        return caption, (path, caption[:64])


class U8CacheSource:
    """Preprocessed raw-uint8 image cache: one memory-mapped
    ``images.u8`` array of shape (N, H, W, 3) — or (N, V, H, W, 3) for
    two-view — plus a ``meta.json`` sidecar with captions/ids.

    The TPU-era analogue of the reference's offline normalized-f32
    pickles (``preprocess_rgc.py:8-51``): the reference decodes+resizes+
    normalizes ONCE offline and trains from pickles; here normalization
    runs inside the jitted model (``adapter.device_var_normalize``), so
    the cache stores RAW resized uint8 — 4x smaller than f32, zero
    image decode at train time, and the per-sample host cost collapses
    to a memmap read + collate.  Build with
    ``mvlt_tpu.data.preprocess.build_u8_cache`` (CLI:
    ``preprocess_data.py u8-cache``)."""

    def __init__(self, cache_dir: str):
        with open(os.path.join(cache_dir, "meta.json")) as f:
            meta = json.load(f)
        self.captions: List[str] = meta["captions"]
        self.img_ids = meta["img_ids"]
        self.cap_ids = meta["cap_ids"]
        shape = tuple(meta["shape"])
        self.images = np.memmap(os.path.join(cache_dir, "images.u8"),
                                dtype=np.uint8, mode="r", shape=shape)

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, index: int):
        # np.asarray: a plain view; the stack in collate makes the copy
        return (np.asarray(self.images[index]), self.captions[index],
                self.img_ids[index], self.cap_ids[index])

    def peek(self, index: int):
        return self.captions[index], self.cap_ids[index]


class SyntheticSource:
    """Deterministic fake source for tests/benchmarks (no reference
    equivalent; the reference has no test data strategy, SURVEY.md §4)."""

    def __init__(self, n: int = 16, image_size: int = 32, seed: int = 0,
                 captions: Optional[List[str]] = None):
        self.n = n
        self.image_size = image_size
        self.seed = seed
        words = ["lung", "heart", "normal", "opacity", "pleural", "effusion",
                 "chest", "left", "right", "mild"]
        rng = np.random.default_rng(seed)
        self.captions = captions or [
            " ".join(rng.choice(words, size=5 + i % 4)) for i in range(n)]

    def __len__(self):
        return self.n

    def __getitem__(self, index: int):
        rng = np.random.default_rng(self.seed * 10007 + index)
        im = rng.normal(size=(3, self.image_size, self.image_size)
                        ).astype(np.float32)
        return im, self.captions[index], index, index

    def peek(self, index: int):
        return self.captions[index], index


class AnnotationSource:
    """(image, report) source over an R2Gen-style annotation.json + image
    dir — feeds :class:`RetrievalDataset` for the IU X-Ray retrieval
    variant (reference ``run_retrieval_iuxray.py:18-179``; two-view images,
    negatives always swap the image)."""

    def __init__(self, image_dir: str, ann_path: str, split: str = "train",
                 two_view: bool = True, image_size: int = 224,
                 normalize: str = "host"):
        self.image_dir = image_dir
        self.two_view = two_view
        self.image_size = image_size
        self.normalize = normalize
        with open(ann_path) as f:
            self.examples = json.load(f)[split]

    def __len__(self):
        return len(self.examples)

    def __getitem__(self, index: int):
        e = self.examples[index]
        paths = e["image_path"]
        if self.normalize == "device":
            load = lambda p: T.load_image_u8(
                os.path.join(self.image_dir, p), self.image_size)
        else:
            load = lambda p: T.load_image_var_normalized(
                os.path.join(self.image_dir, p), self.image_size)
        if self.two_view:
            im = np.stack([load(paths[0]), load(paths[1])], 0)
        else:
            im = load(paths[0])
        return im, e["report"], e["id"], e["id"]

    def peek(self, index: int):
        e = self.examples[index]
        return e["report"], e["id"]


class ConcatSource:
    """Index-range dispatch over multiple sources
    (run_pretrain_rgc_roco_medicat.py:94-129)."""

    def __init__(self, *sources):
        self.sources = sources
        self.offsets = np.cumsum([0] + [len(s) for s in sources])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, index: int):
        i = int(np.searchsorted(self.offsets, index, side="right")) - 1
        im, cap, _, cap_id = self.sources[i][index - int(self.offsets[i])]
        return im, cap, index, (i, cap_id)

    def peek(self, index: int):
        i = int(np.searchsorted(self.offsets, index, side="right")) - 1
        cap, cap_id = _peek(self.sources[i], index - int(self.offsets[i]))
        return cap, (i, cap_id)


def _peek(source, index: int):
    """(caption, cap_id) as cheaply as the source allows: ``peek`` skips
    the image decode entirely where available; otherwise fall back to a
    full fetch."""
    fn = getattr(source, "peek", None)
    if fn is not None:
        return fn(index)
    _, cap, _, cap_id = source[index]
    return cap, cap_id


# ---------------------------------------------------------------------------
# task datasets
# ---------------------------------------------------------------------------

class PretrainDataset:
    """MLM+ITM pretraining samples (run_pretrain*.py).

    Semantics of the multi-source variant (the correct one): on the ITM=0
    branch the *caption string* is replaced before tokenization
    (run_pretrain_rgc_roco_medicat.py:149-156).  (The RGC-only script has a
    bug where the negative caption is overwritten by re-tokenizing the
    original, run_pretrain.py:103-105 — not reproduced.)
    """

    def __init__(self, source, tokenizer, max_length: int = 150,
                 mlm_task: bool = True, itm_task: bool = True, seed: int = 0):
        self.source = source
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.mlm_task = mlm_task
        self.itm_task = itm_task
        self.seed = seed
        self._vocab_words = list(tokenizer.vocab.keys())

    def __len__(self):
        return len(self.source)

    def __getitem__(self, index: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        rng = T.sample_rng(self.seed, epoch, index)
        caption, cap_id = _peek(self.source, index)

        # Decide the ITM branch BEFORE decoding anything: the rejection
        # loop probes candidate captions via peek() (no image decode) and
        # exactly ONE image is decoded per sample — positive, or the
        # negative when the image side is swapped.  (The naive order
        # costs 1.5 decodes/sample expected; on a host-bound input
        # pipeline that is a 1.5x throughput tax.)  The rng draw order is
        # unchanged, so sample streams are identical.
        itm_label = 1
        image_index = index
        if self.itm_task and rng.random() >= 0.5:
            itm_label = 0
            # bounded rejection sampling (the reference's while True,
            # run_pretrain.py:90-93): a degenerate source where no valid
            # negative exists must error, not hang the loader thread
            for _try in range(1000):
                rand_index = int(rng.integers(0, len(self)))
                r_cap, r_cap_id = _peek(self.source, rand_index)
                if rand_index != index and cap_id != r_cap_id:
                    break
            else:
                raise ValueError(
                    "ITM negative sampling found no sample with a "
                    "different cap_id in 1000 draws — the source is too "
                    "small or degenerate for itm_task=True")
            if rng.random() < 0.5:
                image_index = rand_index
            else:
                caption = r_cap
        im_np = self.source[image_index][0]

        tokens = self.tokenizer.tokenize(caption + " " + self.tokenizer.eos_token)
        if self.mlm_task and itm_label == 1:
            tokens, mlm_labels = T.random_mask_word(
                tokens, self.tokenizer.vocab, rng, self._vocab_words)
        else:
            mlm_labels = None
        ids = self.tokenizer.convert_tokens_to_ids(tokens)
        cap_ids, labels = T.pad_truncate_preserve_end(ids, self.max_length,
                                                      mlm_labels)
        return {"image": im_np, "caption_masked": cap_ids,
                "caption_label": labels,
                "itm_label": np.int32(itm_label)}


class MedVQADataset:
    """SLAKE / VQA-RAD pickles (run_vqa.py:17-72)."""

    MAX_LEN = {"SLAKE": 23, "VQA-RAD": 30}

    def __init__(self, root: str, dataset: str, split: str):
        assert dataset in ("SLAKE", "VQA-RAD")
        self.dataset = dataset
        image_path = os.path.join(root, dataset, dataset + "_image_data.pkl")
        text_path = os.path.join(root, dataset, dataset + "_text_data.pkl")
        with open(image_path, "rb") as f:
            self.img_id2idx, self.idx2img_id, self.img_list_in_np = pickle.load(f)
        with open(text_path, "rb") as f:
            entries, self.ans2label, self.label2ans = pickle.load(f)
        self.entries = entries[split]
        self.max_len = self.MAX_LEN[dataset]

    @classmethod
    def from_arrays(cls, images: np.ndarray, entries: List[dict],
                    ans2label: dict, max_len: int = 23) -> "MedVQADataset":
        """Synthetic/test constructor bypassing pickles."""
        self = cls.__new__(cls)
        self.dataset = "SLAKE"
        self.img_list_in_np = images
        self.img_id2idx = {i: i for i in range(len(images))}
        self.idx2img_id = {i: i for i in range(len(images))}
        self.entries = entries
        self.ans2label = ans2label
        self.label2ans = {v: k for k, v in ans2label.items()}
        self.max_len = max_len
        return self

    def __len__(self):
        return len(self.entries)

    def tokenize(self, tokenizer):
        """Append [END], convert, zero-pad to max_len (run_vqa.py:56-72)."""
        assert tokenizer.eos_token == "[END]"
        for entry in self.entries:
            ids = tokenizer.convert_tokens_to_ids(
                tokenizer.tokenize(entry["question"] + " [END]"))
            q = np.zeros(self.max_len, np.int32)
            n = min(len(ids), self.max_len)
            q[:n] = np.asarray(ids[:n], np.int32)
            entry["q_ids"] = q

    def __getitem__(self, index: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        e = self.entries[index]
        v = self.img_list_in_np[self.img_id2idx[e["img_id"]]]
        label = -100 if e["label"] is None else e["label"]
        return {"image": np.asarray(v, np.float32), "question": e["q_ids"],
                "label": np.int32(label),
                "answer_type": e.get("answer_type", "")}


class CaptionDataset:
    """RGC report generation (run_report_generation.py:22-176): mask words
    only on the train split."""

    def __init__(self, source, tokenizer, max_length: int = 100,
                 split: str = "train", seed: int = 0,
                 learning_strategy: str = "unilm"):
        self.source = source
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.split = split
        self.seed = seed
        self.learning_strategy = learning_strategy
        self._vocab_words = list(tokenizer.vocab.keys())

    def __len__(self):
        return len(self.source)

    def _encode(self, caption: str, rng) -> Tuple[np.ndarray, np.ndarray]:
        tokens = self.tokenizer.tokenize(caption + " " +
                                         self.tokenizer.eos_token)
        if self.split == "train" and self.learning_strategy == "unilm":
            tokens, mlm_labels = T.random_mask_word(
                tokens, self.tokenizer.vocab, rng, self._vocab_words)
        elif self.split == "train":
            # 'normal' strategy: labels are the full token ids
            # (run_report_generation_cxr.py:229-230)
            mlm_labels = self.tokenizer.convert_tokens_to_ids(tokens)
        else:
            mlm_labels = None
        ids = self.tokenizer.convert_tokens_to_ids(tokens)
        return T.pad_truncate_preserve_end(ids, self.max_length, mlm_labels)

    def __getitem__(self, index: int, epoch: int = 0) -> Dict:
        rng = T.sample_rng(self.seed, epoch, index)
        im_np, caption, img_id, _ = self.source[index]
        cap_ids, labels = self._encode(caption, rng)
        return {"image": im_np, "caption": cap_ids, "mlm_labels": labels,
                "image_id": img_id, "raw_caption": caption}


class CXRAnnotationDataset(CaptionDataset):
    """IU X-Ray (two-view) / MIMIC-CXR (single-view) over annotation.json
    (run_report_generation_cxr.py:79-270)."""

    def __init__(self, image_dir: str, ann_path: str, tokenizer,
                 split: str = "train", two_view: bool = True,
                 max_length: int = 80, pretrained: bool = True, seed: int = 0,
                 learning_strategy: str = "unilm", normalize: str = "host"):
        self.image_dir = image_dir
        self.two_view = two_view
        self.pretrained = pretrained
        self.normalize = normalize
        clean = T.clean_report_iu_xray if two_view else T.clean_report_mimic_cxr
        with open(ann_path) as f:
            ann = json.load(f)
        self.examples = ann[split]
        for e in self.examples:
            e["report"] = clean(e["report"]).lower()
        super().__init__(self.examples, tokenizer, max_length, split, seed,
                         learning_strategy)

    def __len__(self):
        return len(self.examples)

    def _load_view(self, rel_path: str, rng) -> np.ndarray:
        from PIL import Image
        path = os.path.join(self.image_dir, rel_path)
        if self.pretrained:
            if self.normalize == "device":
                return T.load_image_u8(path)
            return T.load_image_var_normalized(path)
        im = Image.open(path).convert("RGB")
        if self.split == "train":
            return T.train_augment_imagenet(im, rng)
        return T.eval_transform_imagenet(im)

    def __getitem__(self, index: int, epoch: int = 0) -> Dict:
        rng = T.sample_rng(self.seed, epoch, index)
        e = self.examples[index]
        paths = e["image_path"]
        if self.two_view:
            image = np.stack([self._load_view(paths[0], rng),
                              self._load_view(paths[1], rng)], 0)
        else:
            image = self._load_view(paths[0], rng)
        cap_ids, labels = self._encode(e["report"], rng)
        return {"image": image, "caption": cap_ids, "mlm_labels": labels,
                "image_id": e["id"], "raw_caption": e["report"]}


class RetrievalDataset:
    """Train: (positive, negative) pair; test: virtual NxN cross-product
    (run_retrieval.py:18-145).  ``swap`` controls the negative strategy:
    'either' flips a coin between image/caption replacement
    (run_retrieval.py:104-111); 'image' always swaps the image
    (run_retrieval_iuxray.py:130-137)."""

    def __init__(self, source, tokenizer, max_length: int = 80,
                 split: str = "train", seed: int = 0, swap: str = "either"):
        self.source = source
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.split = split
        self.seed = seed
        self.swap = swap
        self.img_num = len(source)

    def __len__(self):
        return self.img_num if self.split == "train" else self.img_num ** 2

    def _cap_ids(self, caption: str) -> np.ndarray:
        ids = self.tokenizer.convert_tokens_to_ids(
            self.tokenizer.tokenize(caption + " " + self.tokenizer.eos_token))
        out, _ = T.pad_truncate_preserve_end(ids, self.max_length)
        return out

    def __getitem__(self, index: int, epoch: int = 0) -> Dict:
        if self.split == "train":
            rng = T.sample_rng(self.seed, epoch, index)
            cap_gt, cap_id = _peek(self.source, index)
            for _try in range(1000):
                rand_index = int(rng.integers(0, self.img_num))
                r_cap, r_cap_id = _peek(self.source, rand_index)
                if rand_index != index and cap_id != r_cap_id:
                    break
            else:
                raise ValueError(
                    "retrieval negative sampling found no sample with a "
                    "different cap_id in 1000 draws — source too small")
            im_gt = self.source[index][0]
            if self.swap == "image" or rng.random() < 0.5:
                # negative image decode only when the image side swaps
                im_neg, cap_neg = self.source[rand_index][0], cap_gt
            else:
                im_neg, cap_neg = im_gt, r_cap
            return {"pos": {"image": im_gt, "caption": self._cap_ids(cap_gt),
                            "label": np.int32(1)},
                    "neg": {"image": im_neg, "caption": self._cap_ids(cap_neg),
                            "label": np.int32(0)}}
        img_idx, cap_idx = divmod(index, self.img_num)
        im1, _, _, cap_id1 = self.source[img_idx]
        cap2, cap_id2 = _peek(self.source, cap_idx)
        label = 1 if img_idx == cap_idx or cap_id1 == cap_id2 else 0
        return {"image": im1, "caption": self._cap_ids(cap2),
                "label": np.int32(label)}
