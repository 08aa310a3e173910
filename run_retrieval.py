#!/usr/bin/env python
"""Image-text retrieval train / test / rank (TPU-native equivalent of
reference ``run_retrieval.py`` and ``run_retrieval_iuxray.py``)."""

import argparse
import dataclasses
import json
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
    p.add_argument("--rgc_index", default=None,
                   help="RGC {split}_img_idx2path.pkl (train path)")
    p.add_argument("--iu_xray_root", default=None,
                   help="IU X-Ray root with images/ + annotation.json "
                        "(run_retrieval_iuxray.py variant; implies "
                        "--swap image)")
    p.add_argument("--model_name", default="./checkpoints/retrieval")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--backbone_ckpt", default=None,
                   help="official backbone checkpoint (Swin .pth / "
                        "torchvision ResNet / HF state dict)")
    p.add_argument("--conv", default="swin")
    p.add_argument("--swap", default="either", choices=["either", "image"],
                   help="negative sampling: iu-xray variant uses 'image'")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-6)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--max_length", type=int, default=80)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=-1,
                   help="host loader worker processes (-1 auto, 0 threaded)")
    p.add_argument("--host_normalize", action="store_true",
                   help="normalize images on the host (float32) instead of on-device")
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_test", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if not (args.do_train or args.do_test):
        raise SystemExit("nothing to do: pass --do_train and/or --do_test")
    import jax.numpy as jnp
    from mvlt_tpu.config import (FusionConfig, MeshConfig, MVLTConfig,
                                 SwinConfig, TrainConfig)
    from mvlt_tpu.data.datasets import (PickleSource, RetrievalDataset,
                                        SyntheticSource)
    from mvlt_tpu.models.heads import RetrievalModel
    from mvlt_tpu.tasks.common import TaskRunner
    from mvlt_tpu.tasks.retrieval import (eval_retrieval, train_retrieval)
    from mvlt_tpu.text.tokenizer import default_tokenizer
    from mvlt_tpu.utils import checkpoint as ckpt_lib

    tokenizer = default_tokenizer(synthetic_ok=getattr(args, "synthetic", False))
    cfg = MVLTConfig.for_retrieval(lr=args.lr, max_length=args.max_length)
    cfg = dataclasses.replace(cfg, conv=args.conv)
    if args.tiny:
        from mvlt_tpu.config import tiny_config
        cfg = tiny_config(cfg)
    cfg = cfg.with_tokenizer(tokenizer)

    if args.synthetic:
        src_train = SyntheticSource(n=32, image_size=32 if args.tiny else 224)
        src_test = SyntheticSource(n=8, image_size=32 if args.tiny else 224,
                                   seed=1)
    elif args.iu_xray_root:
        from mvlt_tpu.data.datasets import AnnotationSource
        import os as _os
        args.swap = "image"  # run_retrieval_iuxray.py:130-137
        mk = lambda split: AnnotationSource(
            _os.path.join(args.iu_xray_root, "images"),
            _os.path.join(args.iu_xray_root, "annotation.json"), split,
            normalize="host" if args.host_normalize else "device")
        src_train, src_test = mk("train"), mk("test")
    else:
        if not args.rgc_index:
            raise SystemExit("no data source: pass --rgc_index, "
                             "--iu_xray_root, or --synthetic")
        src_train = PickleSource(args.rgc_index)
        src_test = PickleSource(_split_index_path(args.rgc_index, "test"))
    train_ds = RetrievalDataset(src_train, tokenizer, args.max_length,
                                "train", swap=args.swap)
    test_ds = RetrievalDataset(src_test, tokenizer, args.max_length, "test")

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
    runner = TaskRunner(RetrievalModel(cfg), cfg, tc, workdir=args.model_name,
                        name="retrieval")
    sample = train_ds[0]["pos"]
    runner.init_state((jnp.asarray(sample["image"][None]),
                       jnp.asarray(sample["caption"][None])),
                      pretrained_variables=pretrained)
    runner.maybe_restore()

    if args.do_train:
        train_retrieval(runner, train_ds, epochs=args.epochs)
    if args.do_test:
        result = eval_retrieval(runner, test_ds,
                                batch_size=min(64, len(test_ds)))
        runner.logger.info("retrieval eval: %s", result)
        if args.model_name:
            os.makedirs(args.model_name, exist_ok=True)
            with open(os.path.join(args.model_name, "eval.json"), "w") as f:
                json.dump(result, f, indent=2)
        print(json.dumps(result))


if __name__ == "__main__":
    main()
