#!/usr/bin/env python
"""Report generation train + beam-search eval (TPU-native equivalent of
reference ``run_report_generation.py`` (RGC) and
``run_report_generation_cxr.py`` (IU X-Ray / MIMIC-CXR) — one script,
dataset selected by --dataset)."""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mvlt_tpu.utils.platform import honor_jax_platforms

honor_jax_platforms()


def _split_index_path(index_path, split):
    """Derive a sibling split's pickle path from the train index by
    renaming only the BASENAME (a whole-path .replace would mangle
    directories containing 'train' and silently no-op when the substring
    is absent — evaluating the training set as the test set)."""
    import os
    d, base = os.path.split(index_path)
    if "train" not in base:
        raise SystemExit(
            f"cannot derive the {split!r} index from {index_path!r}: "
            "the filename does not contain 'train' — pass a per-split "
            "index path explicitly")
    return os.path.join(d, base.replace("train", split))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="iu_xray",
                   choices=["rgc", "iu_xray", "mimic_cxr", "synthetic"])
    p.add_argument("--data_root", default="./dataset")
    p.add_argument("--rgc_index", default=None)
    p.add_argument("--model_name", default="./checkpoints/caption")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--backbone_ckpt", default=None,
                   help="official backbone checkpoint (Swin .pth / "
                        "torchvision ResNet / HF state dict)")
    p.add_argument("--conv", default="swin")
    p.add_argument("--learning_strategy", default="unilm",
                   choices=["unilm", "normal"])
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--test_freq", type=int, default=5)
    p.add_argument("--num_beams", type=int, default=5)
    p.add_argument("--max_length", type=int, default=None)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=-1,
                   help="host loader worker processes (-1 auto, 0 threaded)")
    p.add_argument("--host_normalize", action="store_true",
                   help="normalize images on the host (float32) instead of on-device")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--do_train", action="store_true", default=None)
    p.add_argument("--no_train", dest="do_train", action="store_false")
    p.add_argument("--do_test", action="store_true")
    p.add_argument("--quant", default="", choices=["", "int8w"],
                   help="weight-only int8 serving for --do_test decode "
                        "(big 2-D kernels held int8 in device memory, "
                        "dequantized to bf16 inside the jitted decode)")
    return p.parse_args()


def default_max_length(dataset):
    return {"rgc": 100, "iu_xray": 80, "mimic_cxr": 150, "synthetic": 24}[dataset]


def build_datasets(args, tokenizer, max_length):
    from mvlt_tpu.data.datasets import (CaptionDataset, CXRAnnotationDataset,
                                        PickleSource, SyntheticSource)
    if args.dataset == "synthetic":
        mk = lambda split, seed: CaptionDataset(
            SyntheticSource(n=16, image_size=32 if args.tiny else 224,
                            seed=seed),
            tokenizer, max_length, split,
            learning_strategy=args.learning_strategy)
        # distinct seeds: an identically-seeded test split would score
        # memorization of the exact training samples
        return mk("train", 0), mk("test", 1)
    if args.dataset == "rgc":
        if not args.rgc_index:
            raise SystemExit("--dataset rgc requires --rgc_index")
        mk = lambda split: CaptionDataset(
            PickleSource(_split_index_path(args.rgc_index, split)),
            tokenizer, max_length, split,
            learning_strategy=args.learning_strategy)
        return mk("train"), mk("test")
    two_view = args.dataset == "iu_xray"
    root = os.path.join(args.data_root, args.dataset)
    mk = lambda split: CXRAnnotationDataset(
        os.path.join(root, "images"), os.path.join(root, "annotation.json"),
        tokenizer, split, two_view=two_view, max_length=max_length,
        pretrained=args.pretrained is not None,
        learning_strategy=args.learning_strategy,
        normalize="host" if args.host_normalize else "device")
    return mk("train"), mk("test")


def main():
    args = parse_args()
    if args.do_train is None:
        # train by default (reference behavior), but `--do_test` alone
        # means eval-only — nobody expects an eval invocation to first
        # run 100 epochs of training
        args.do_train = not args.do_test
    import jax.numpy as jnp
    from mvlt_tpu.config import (FusionConfig, MeshConfig, MVLTConfig,
                                 SwinConfig, TrainConfig)
    from mvlt_tpu.models.heads import CaptionModel
    from mvlt_tpu.tasks.caption import eval_caption, train_caption
    from mvlt_tpu.tasks.common import TaskRunner
    from mvlt_tpu.text.tokenizer import default_tokenizer
    from mvlt_tpu.utils import checkpoint as ckpt_lib

    tokenizer = default_tokenizer(synthetic_ok=(args.dataset == "synthetic"))
    max_length = args.max_length or default_max_length(args.dataset)
    cfg = MVLTConfig.for_caption(lr=args.lr, max_length=max_length)
    cfg = dataclasses.replace(cfg, conv=args.conv)
    if args.tiny:
        from mvlt_tpu.config import tiny_config
        cfg = tiny_config(cfg)
    cfg = cfg.with_tokenizer(tokenizer)

    train_ds, test_ds = build_datasets(args, tokenizer, max_length)

    pretrained = []
    if args.pretrained:
        pretrained.append(ckpt_lib.load_pretrained(args.pretrained)[1])
    if args.backbone_ckpt:
        from mvlt_tpu.utils.bootstrap import load_backbone
        pretrained.append(load_backbone(args.backbone_ckpt, cfg))
    pretrained = pretrained or None

    tc = TrainConfig(batch_size=args.batch_size, epochs=args.epochs,
                     num_workers=args.num_workers,
                     mesh=MeshConfig(model_parallel=args.model_parallel))
    runner = TaskRunner(CaptionModel(cfg), cfg, tc, workdir=args.model_name,
                        name="caption")
    sample = train_ds[0]
    runner.init_state((jnp.asarray(sample["image"][None]),
                       jnp.asarray(sample["caption"][None])),
                      pretrained_variables=pretrained)
    runner.maybe_restore()

    if args.do_train:
        train_caption(runner, train_ds, test_ds, epochs=args.epochs,
                      test_freq=args.test_freq,
                      learning_strategy=args.learning_strategy,
                      num_beams=args.num_beams, tokenizer=tokenizer)
    if args.do_test:
        scores = eval_caption(runner, test_ds, tokenizer,
                              num_beams=args.num_beams,
                              strategy=args.learning_strategy,
                              quant=args.quant)
        print(scores)


if __name__ == "__main__":
    main()
