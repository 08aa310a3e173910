"""Host input-pipeline throughput: images/sec through the real
DataLoader (PIL decode + variance-normalize + tokenize/mask + collate,
8 threads) on RGC-shaped synthetic JPEGs.

The trainer consumes ~425+ samples/sec (BENCH_r02 pretrain step); this
measures whether the host loader can feed it (VERDICT r2 weak #5).
Pure host bench — safe to run while the chip is busy."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from mvlt_tpu.data.datasets import ImageFolderSource, PretrainDataset
from mvlt_tpu.data.loader import DataLoader
from mvlt_tpu.data import transforms as T
from mvlt_tpu.text.tokenizer import WordPieceTokenizer

N_IMAGES = 512
SRC_SIZE = 512          # RGC source JPEGs are ~512-2048px; 512 is the low end
BATCH = 32
CAPTION = ("the cardiac silhouette and mediastinum size are within normal "
           "limits . there is no pulmonary edema . there is no focal "
           "consolidation . there are no xxxx of a pleural effusion .")


def make_jpegs(root: str):
    rng = np.random.default_rng(0)
    items = []
    base = rng.integers(0, 255, (SRC_SIZE, SRC_SIZE), np.uint8)
    for i in range(N_IMAGES):
        # vary every file slightly so decode work isn't page-cache-trivial
        arr = np.roll(base, i * 7, axis=0)
        path = os.path.join(root, f"im{i:04d}.jpg")
        Image.fromarray(arr).convert("RGB").save(path, quality=90)
        items.append((path, CAPTION))
    return items


def main():
    from mvlt_tpu.text.tokenizer import find_default_vocab
    tok = WordPieceTokenizer(find_default_vocab())
    with tempfile.TemporaryDirectory() as root:
        items = make_jpegs(root)
        src = ImageFolderSource(items, image_size=224)

        # raw single-thread decode+normalize floor
        t0 = time.perf_counter()
        for i in range(64):
            T.load_image_var_normalized(items[i][0], 224)
        dt = time.perf_counter() - t0
        print(f"decode+normalize single-thread: {64 / dt:7.1f} images/sec")

        ds = PretrainDataset(src, tok, max_length=80)
        for workers in (4, 8, 12):
            loader = DataLoader(ds, BATCH, shuffle=True, drop_last=True,
                                num_workers=workers, prefetch=4)
            it = loader.epoch(0)
            next(it)
            t0 = time.perf_counter()
            n = 0
            for ep in range(4):
                for batch in loader.epoch(ep):
                    n += batch["image"].shape[0]
            dt = time.perf_counter() - t0
            print(f"DataLoader {workers:2d} procs  : {n / dt:7.1f} "
                  f"images/sec ({n} images, {dt:.1f}s)")
        for threads in (1, 8):
            loader = DataLoader(ds, BATCH, shuffle=True, drop_last=True,
                                num_threads=threads, prefetch=4)
            # warm one epoch fragment, then time full epochs
            it = loader.epoch(0)
            next(it)
            t0 = time.perf_counter()
            n = 0
            for ep in range(4):
                for batch in loader.epoch(ep):
                    n += batch["image"].shape[0]
            dt = time.perf_counter() - t0
            print(f"DataLoader {threads:2d} threads: {n / dt:7.1f} "
                  f"images/sec ({n} images, {dt:.1f}s)")


if __name__ == "__main__":
    main()
