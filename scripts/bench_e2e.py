"""END-TO-END pretraining throughput: synthetic RGC-shaped JPEGs ->
production DataLoader (process workers, TrainConfig defaults) -> real
flagship pretrain train steps on the chip.

This is the integration proof for VERDICT r3 next #1: the host loader
must feed the device step at >= ~0.9x the device-only rate with the
DEFAULT configuration (TrainConfig.num_workers=8), using the exact
production plumbing (DataLoader.epoch -> step.prefetch device queue).

Reference comparison: torch DataLoader num_workers=8
(/root/reference/run_pretrain.py:255).

Usage: python scripts/bench_e2e.py [--workers 8] [--batch 32]
"""
import argparse
import dataclasses
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np
from PIL import Image

N_IMAGES = 1024
SRC_SIZE = 512
CAPTION = ("the cardiac silhouette and mediastinum size are within normal "
           "limits . there is no pulmonary edema . there is no focal "
           "consolidation . there are no xxxx of a pleural effusion .")


def make_jpegs(root: str):
    rng = np.random.default_rng(0)
    items = []
    base = rng.integers(0, 255, (SRC_SIZE, SRC_SIZE), np.uint8)
    for i in range(N_IMAGES):
        arr = np.roll(base, i * 7, axis=0)
        path = os.path.join(root, f"im{i:04d}.jpg")
        Image.fromarray(arr).convert("RGB").save(path, quality=90)
        items.append((path, CAPTION))
    return items


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=None,
                    help="override TrainConfig.num_workers (default: use "
                         "the production default)")
    ap.add_argument("--host_normalize", action="store_true",
                    help="use the host float32 normalize chain instead of "
                         "the production device-normalize path")
    ap.add_argument("--jpeg_draft", action="store_true")
    ap.add_argument("--u8_cache", action="store_true",
                    help="preprocess the JPEGs into the raw-uint8 memmap "
                         "cache first (the reference's own production "
                         "layout, preprocess_rgc.py:8-51) and train from "
                         "it — host work becomes read+collate")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--prefetch", type=int, default=2,
                    help="device-resident batches ahead of the consumer")
    ap.add_argument("--put_threads", type=int, default=1,
                    help="parallel host->device transfer threads "
                         "(order-preserving)")
    args = ap.parse_args()

    # Build the dataset + loader FIRST so worker forks happen before most
    # device work, then bring up the model.
    from mvlt_tpu.config import MeshConfig, TrainConfig
    from mvlt_tpu.data.datasets import ImageFolderSource, PretrainDataset
    from mvlt_tpu.data.loader import DataLoader
    from mvlt_tpu.text.tokenizer import WordPieceTokenizer

    tc = TrainConfig(batch_size=args.batch)
    workers = tc.num_workers if args.workers is None else args.workers

    from mvlt_tpu.text.tokenizer import find_default_vocab
    tok = WordPieceTokenizer(find_default_vocab())
    tmp = tempfile.TemporaryDirectory()
    items = make_jpegs(tmp.name)
    if args.u8_cache:
        from mvlt_tpu.data.datasets import U8CacheSource
        from mvlt_tpu.data.preprocess import build_u8_cache
        t0 = time.perf_counter()
        cache_dir = build_u8_cache(items, os.path.join(tmp.name, "u8cache"))
        print(f"u8-cache build (offline, once): "
              f"{N_IMAGES / (time.perf_counter() - t0):7.1f} images/sec")
        src = U8CacheSource(cache_dir)
    else:
        src = ImageFolderSource(
            items, image_size=224, fast_decode=args.jpeg_draft,
            normalize="host" if args.host_normalize else "device")
    ds = PretrainDataset(src, tok, max_length=80)
    loader = DataLoader(ds, args.batch, shuffle=True, drop_last=True,
                        num_workers=workers)

    import jax
    import jax.numpy as jnp
    from mvlt_tpu.flagship import flagship_vqa_config, zeros_init
    from mvlt_tpu.models.heads import PretrainModel
    from mvlt_tpu.parallel import build_mesh
    from mvlt_tpu.train import (create_train_state, make_optimizer,
                                make_pretrain_step, shard_train_state)

    cfg = dataclasses.replace(flagship_vqa_config(), itm_task=True,
                              max_length=80)
    model = PretrainModel(cfg, dtype=jnp.bfloat16)
    sample = ds.__getitem__(0, 0)
    variables = zeros_init(model,
                           jnp.asarray(sample["image"][None]),
                           jnp.asarray(sample["caption_masked"][None]),
                           jnp.asarray(sample["caption_label"][None]),
                           jnp.asarray(sample["itm_label"][None]))
    mesh = build_mesh(MeshConfig())
    state, shardings = shard_train_state(
        create_train_state(model, variables, make_optimizer(cfg)), mesh)
    step = make_pretrain_step(model, False, mesh, shardings)
    key = jax.random.key(0, impl=tc.rng_impl)

    # device-only rate on a captured batch (same session, same state)
    warm = next(iter(step.prefetch(loader.epoch(0))))
    pf = dict(size=args.prefetch, threads=args.put_threads)
    state, m = step(state, warm, key)
    float(jax.device_get(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, warm, key)
    float(jax.device_get(m["loss"]))
    dev_rate = args.batch * 10 / (time.perf_counter() - t0)
    print(f"device-only step rate : {dev_rate:7.1f} samples/sec")

    # end-to-end: production loop shape (loader.epoch -> step.prefetch)
    n = 0
    t0 = time.perf_counter()
    for ep in range(args.epochs):
        for b in step.prefetch(loader.epoch(ep), **pf):
            state, m = step(state, b, key)
            n += args.batch
    float(jax.device_get(m["loss"]))
    dt = time.perf_counter() - t0
    e2e = n / dt
    print(f"end-to-end ({workers} workers): {e2e:7.1f} samples/sec "
          f"({n} samples, {dt:.1f}s)  ratio vs device-only: "
          f"{e2e / dev_rate:.2f}")
    tmp.cleanup()


if __name__ == "__main__":
    main()
