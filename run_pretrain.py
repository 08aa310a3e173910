#!/usr/bin/env python
"""MLM+ITM pretraining over RGC / ROCO / MedICaT (TPU-native equivalent of
reference ``run_pretrain.py`` / ``run_pretrain_roco_medicat.py`` /
``run_pretrain_rgc_roco_medicat.py`` — one script, sources selected by
flags)."""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mvlt_tpu.utils.platform import honor_jax_platforms

honor_jax_platforms()


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--rgc_index", default=None,
                   help="RGC train_img_idx2path.pkl path")
    p.add_argument("--roco_root", default=None)
    p.add_argument("--medicat_root", default=None)
    p.add_argument("--model_name", default="./checkpoints/pretrain")
    p.add_argument("--export_dir", default="./checkpoints/pretrain_export")
    p.add_argument("--conv", default="swin")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=4e-5)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--max_length", type=int, default=80)
    p.add_argument("--itm_task", action="store_true", default=True)
    p.add_argument("--no_itm_task", dest="itm_task", action="store_false")
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=-1,
                   help="host loader worker processes (-1 auto, 0 threaded)")
    p.add_argument("--host_normalize", action="store_true",
                   help="normalize images on the host (float32) instead of on-device")
    p.add_argument("--jpeg_draft", action="store_true",
                   help="libjpeg draft-mode decode (~1.5x faster, slightly different pixels)")
    p.add_argument("--backbone_ckpt", default=None,
                   help="official backbone checkpoint (Swin .pth / "
                        "torchvision ResNet / HF state dict), loaded into "
                        "the fresh model like the reference does at build "
                        "(modules/model.py:222-226)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args()


def build_source(args):
    from mvlt_tpu.data.datasets import (ConcatSource, ImageFolderSource,
                                        PickleSource, SyntheticSource)
    sources = []
    if args.synthetic:
        sources.append(SyntheticSource(n=64, image_size=32 if args.tiny
                                       else 224))
    if args.rgc_index:
        sources.append(PickleSource(args.rgc_index))
    if args.roco_root:
        sources.append(ImageFolderSource.from_roco(args.roco_root))
    if args.medicat_root:
        sources.append(ImageFolderSource.from_medicat(args.medicat_root))
    for src in sources:
        if isinstance(src, ImageFolderSource):
            src.normalize = "host" if args.host_normalize else "device"
            src.fast_decode = args.jpeg_draft
    if not sources:
        raise SystemExit("no data source given (use --rgc_index/--roco_root/"
                         "--medicat_root or --synthetic)")
    return sources[0] if len(sources) == 1 else ConcatSource(*sources)


def main():
    args = parse_args()
    import jax.numpy as jnp
    from mvlt_tpu.config import (FusionConfig, MeshConfig, MVLTConfig,
                                 SwinConfig, TrainConfig)
    from mvlt_tpu.data.datasets import PretrainDataset
    from mvlt_tpu.models.heads import PretrainModel
    from mvlt_tpu.tasks.common import TaskRunner
    from mvlt_tpu.tasks.pretrain import train_pretrain
    from mvlt_tpu.text.tokenizer import default_tokenizer

    tokenizer = default_tokenizer(synthetic_ok=getattr(args, "synthetic", False))
    cfg = MVLTConfig.for_pretrain(lr=args.lr)
    cfg = dataclasses.replace(cfg, conv=args.conv, itm_task=args.itm_task,
                              max_length=args.max_length)
    if args.tiny:
        from mvlt_tpu.config import tiny_config
        cfg = tiny_config(cfg)
    cfg = cfg.with_tokenizer(tokenizer)

    source = build_source(args)
    dataset = PretrainDataset(source, tokenizer, max_length=args.max_length,
                              mlm_task=cfg.mlm_task, itm_task=cfg.itm_task)

    tc = TrainConfig(batch_size=args.batch_size, epochs=args.epochs,
                     num_workers=args.num_workers,
                     mesh=MeshConfig(model_parallel=args.model_parallel))
    runner = TaskRunner(PretrainModel(cfg), cfg, tc, workdir=args.model_name,
                        name="pretrain")
    sample = dataset[0]
    pretrained = None
    if args.backbone_ckpt:
        from mvlt_tpu.utils.bootstrap import load_backbone
        pretrained = [load_backbone(args.backbone_ckpt, cfg)]
    runner.init_state((jnp.asarray(sample["image"][None]),
                       jnp.asarray(sample["caption_masked"][None]),
                       jnp.asarray(sample["caption_label"][None]),
                       jnp.asarray(sample["itm_label"][None])),
                      pretrained_variables=pretrained)
    runner.maybe_restore()
    train_pretrain(runner, dataset, epochs=args.epochs,
                   export_dir=args.export_dir)


if __name__ == "__main__":
    main()
