#!/usr/bin/env python
"""Med-VQA finetune + eval (TPU-native equivalent of reference
``run_vqa.py``): SLAKE / VQA-RAD, per-epoch validation, best checkpoint,
open/closed accuracy, multi-seed rounds."""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mvlt_tpu.utils.platform import honor_jax_platforms

honor_jax_platforms()


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="SLAKE", choices=["SLAKE", "VQA-RAD"])
    p.add_argument("--data_root", default="./dataset")
    p.add_argument("--model_name", default="./checkpoints/vqa")
    p.add_argument("--pretrained", default=None,
                   help="pretrain export dir (save_pretrained format)")
    p.add_argument("--backbone_ckpt", default=None,
                   help="official backbone checkpoint (Swin .pth / "
                        "torchvision ResNet / HF state dict)")
    p.add_argument("--conv", default="swin")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=4e-5)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--total_round", type=int, default=1,
                   help="seeds to train (reference runs 10)")
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=-1,
                   help="host loader worker processes (-1 auto, 0 threaded)")
    p.add_argument("--synthetic", action="store_true",
                   help="smoke-run on synthetic data (no dataset needed)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model for smoke runs")
    return p.parse_args()


def build_config(args, tokenizer, result_num):
    from mvlt_tpu.config import (FusionConfig, MVLTConfig, SwinConfig)
    cfg = MVLTConfig.for_vqa(result_num=result_num, lr=args.lr)
    cfg = dataclasses.replace(cfg, conv=args.conv)
    if args.tiny:
        from mvlt_tpu.config import tiny_config
        cfg = tiny_config(cfg)
    return cfg.with_tokenizer(tokenizer)


def build_datasets(args, tokenizer):
    from mvlt_tpu.data.datasets import MedVQADataset
    if args.synthetic:
        import numpy as np
        size = 32 if args.tiny else 224
        images = np.random.default_rng(0).normal(
            size=(8, 3, size, size)).astype(np.float32)
        entries = lambda n: [
            {"img_id": i % 8, "question": f"is the finding {i} present ?",
             "label": i % 4, "answer_type": "OPEN" if i % 2 else "CLOSED"}
            for i in range(n)]
        mk = lambda n: MedVQADataset.from_arrays(
            images, entries(n), {str(i): i for i in range(4)})
        train, valid, test = mk(32), mk(8), mk(8)
    else:
        train = MedVQADataset(args.data_root, args.dataset, "train")
        valid = MedVQADataset(args.data_root, args.dataset, "validate") \
            if args.dataset == "SLAKE" else None
        test = MedVQADataset(args.data_root, args.dataset, "test")
    for ds in (train, valid, test):
        if ds is not None:
            ds.tokenize(tokenizer)
    return train, valid, test


def main():
    args = parse_args()
    import jax
    from mvlt_tpu.config import MeshConfig, TrainConfig
    from mvlt_tpu.models.heads import VQAModel
    from mvlt_tpu.tasks.common import TaskRunner
    from mvlt_tpu.tasks.vqa import train_vqa
    from mvlt_tpu.text.tokenizer import default_tokenizer
    from mvlt_tpu.utils import checkpoint as ckpt_lib

    tokenizer = default_tokenizer(synthetic_ok=args.synthetic)
    train, valid, test = build_datasets(args, tokenizer)
    result_num = len(train.ans2label)
    cfg = build_config(args, tokenizer, result_num)

    pretrained = []
    if args.pretrained:
        pretrained.append(ckpt_lib.load_pretrained(args.pretrained)[1])
    if args.backbone_ckpt:
        from mvlt_tpu.utils.bootstrap import load_backbone
        pretrained.append(load_backbone(args.backbone_ckpt, cfg))
    pretrained = pretrained or None

    results = []
    for round_i in range(args.total_round):
        tc = TrainConfig(batch_size=args.batch_size, epochs=args.epochs,
                         seed=round_i,
                         num_workers=args.num_workers,
                         mesh=MeshConfig(model_parallel=args.model_parallel))
        runner = TaskRunner(VQAModel(cfg), cfg, tc,
                            workdir=f"{args.model_name}/round{round_i}",
                            name="vqa")
        sample = train[0]
        import jax.numpy as jnp
        runner.init_state((jnp.asarray(sample["image"][None]),
                           jnp.asarray(sample["question"][None])),
                          pretrained_variables=pretrained)
        best = train_vqa(runner, train, valid, test, epochs=args.epochs)
        runner.logger.info("round %d: %s", round_i, best)
        results.append(best)

    if jax.process_index() == 0:
        os.makedirs(args.model_name, exist_ok=True)
        with open(os.path.join(args.model_name, "results.json"), "w") as f:
            json.dump(results, f, indent=2, default=str)
        print(json.dumps(results, default=str))


if __name__ == "__main__":
    main()
