#!/usr/bin/env python
"""Generate ImageNet-100 'relpath label' list files.

The reference ships pregenerated list files (dataset/*.txt, 102,170 train /
25,550 val lines). This tool regenerates equivalent lists for any local
ImageNet layout from the shipped class-split definition
(imagenet100_classes.txt: 'wnid label' per line, derived from the
reference's effb0 split) with the same 0.8 train/val ratio and deterministic
per-class shuffling.

Usage:
    python dataset/make_lists.py --img_root /path/to/imagenet/train \
        --out_dir ./dataset --ratio 0.8 --seed 0
"""

import argparse
import os
import random


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--img_root', required=True,
                   help='ImageNet train root (wnid subdirectories)')
    p.add_argument('--classes', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        'imagenet100_classes.txt'))
    p.add_argument('--out_dir', default=os.path.dirname(
        os.path.abspath(__file__)))
    p.add_argument('--ratio', type=float, default=0.8)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    classes = []
    with open(args.classes) as f:
        for line in f:
            wnid, label = line.split()
            classes.append((wnid, int(label)))

    rng = random.Random(args.seed)
    train_lines, val_lines = [], []
    for wnid, label in classes:
        d = os.path.join(args.img_root, wnid)
        files = sorted(os.listdir(d))
        rng.shuffle(files)
        cut = int(len(files) * args.ratio)
        train_lines += [f"{wnid}/{fn} {label}" for fn in files[:cut]]
        val_lines += [f"{wnid}/{fn} {label}" for fn in files[cut:]]

    tr = os.path.join(args.out_dir, 'ImageNet-100_train_cls_ratio{}.txt'
                      .format(args.ratio))
    va = os.path.join(args.out_dir, 'ImageNet-100_val_cls_ratio{}.txt'
                      .format(args.ratio))
    with open(tr, 'w') as f:
        f.write('\n'.join(train_lines) + '\n')
    with open(va, 'w') as f:
        f.write('\n'.join(val_lines) + '\n')
    print(f"{len(train_lines)} train -> {tr}")
    print(f"{len(val_lines)} val -> {va}")


if __name__ == '__main__':
    main()
