#!/usr/bin/env python
"""Offline dataset preprocessing CLI (TPU-native equivalent of reference
``preprocess_rgc.py`` + ``preprocess_VQA.py``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["rgc", "vqa-images", "vqa-text"])
    p.add_argument("--data_root", default="./dataset")
    p.add_argument("--dataset", default="SLAKE", choices=["SLAKE", "VQA-RAD"])
    p.add_argument("--image_size", type=int, default=224)
    args = p.parse_args()

    from mvlt_tpu.data import preprocess as pp
    if args.task == "rgc":
        pp.preprocess_rgc(os.path.join(args.data_root, "RGC"),
                          image_size=args.image_size)
    elif args.task == "vqa-images":
        out = pp.preprocess_vqa_images(args.data_root, args.dataset,
                                       args.image_size)
        print("wrote", out)
    else:
        out = pp.preprocess_vqa_text(args.data_root, args.dataset)
        print("wrote", out)


if __name__ == "__main__":
    main()
