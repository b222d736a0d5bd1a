#!/usr/bin/env python
"""Generate a procedural real-JPEG classification dataset.

Purpose: exercise the FULL search pipeline — C++ libjpeg decode, fused
augment, threaded loader, elasticity on a measured LUT — end-to-end on a
box without ImageNet (the reference recipe trains on ImageNet-100,
train_search.py:124-153). Images are real JPEG files with class-dependent
procedural textures, so the task is genuinely learnable: each class has a
fixed signature (two hues, a pattern family, orientation, frequency) and
every image randomizes phase, scale, noise and lighting on top.

Output layout mirrors ImageNet: <out_root>/class_<label>/<name>.jpg plus
'relpath label' list files consumable by tfnas_tpu.data.ImageList.

Usage:
    python dataset/make_proxy_dataset.py --out_root /data/proxy100 \
        --num_classes 100 --train_per_class 200 --val_per_class 50
"""

import argparse
import os

import numpy as np


def class_recipe(label, rng):
    """Fixed per-class texture signature."""
    return {
        "family": label % 4,                       # stripes/checker/blobs/rings
        "hue1": rng.uniform(0, 1),
        "hue2": rng.uniform(0, 1),
        "angle": rng.uniform(0, np.pi),
        "freq": rng.uniform(3.0, 12.0),
        "duty": rng.uniform(0.35, 0.65),
    }


def hsv_to_rgb(h, s, v):
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    i = int(i) % 6
    return [(v, t, p), (q, v, p), (p, v, t),
            (t, p, v), (p, q, v), (v, p, q)][i]


def render(recipe, rng, size):
    """One [size, size, 3] uint8 texture image from the class recipe with
    per-image randomness."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    ang = recipe["angle"] + rng.normal(0, 0.08)
    freq = recipe["freq"] * rng.uniform(0.85, 1.18)
    phase = rng.uniform(0, 2 * np.pi)
    u = np.cos(ang) * xx + np.sin(ang) * yy
    v = -np.sin(ang) * xx + np.cos(ang) * yy

    fam = recipe["family"]
    if fam == 0:      # stripes
        field = np.sin(2 * np.pi * freq * u + phase)
        m = (field > np.cos(np.pi * recipe["duty"])).astype(np.float32)
    elif fam == 1:    # checker
        m = ((np.floor(freq * u + phase) + np.floor(freq * v)) % 2)
    elif fam == 2:    # smooth blobs: threshold of two low-freq sinusoids
        field = (np.sin(2 * np.pi * freq * u + phase)
                 + np.sin(2 * np.pi * freq * 0.73 * v + 1.7 * phase))
        m = (field > 2 * (recipe["duty"] - 0.5)).astype(np.float32)
    else:             # rings
        cx, cy = rng.uniform(0.3, 0.7, 2)
        r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        m = (np.sin(2 * np.pi * freq * r + phase) > 0).astype(np.float32)

    c1 = np.asarray(hsv_to_rgb(recipe["hue1"], rng.uniform(0.55, 0.9),
                               rng.uniform(0.6, 0.95)), np.float32)
    c2 = np.asarray(hsv_to_rgb(recipe["hue2"], rng.uniform(0.55, 0.9),
                               rng.uniform(0.25, 0.6)), np.float32)
    img = m[..., None] * c1 + (1 - m[..., None]) * c2
    img = img + rng.normal(0, rng.uniform(0.02, 0.08),
                           img.shape).astype(np.float32)
    # mild vignette for lighting variation
    cx, cy = rng.uniform(0.3, 0.7, 2)
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
    img = img * (1.0 - rng.uniform(0.0, 0.35) * d2)[..., None]
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    from PIL import Image

    p = argparse.ArgumentParser()
    p.add_argument("--out_root", required=True)
    p.add_argument("--num_classes", type=int, default=100)
    p.add_argument("--train_per_class", type=int, default=200)
    p.add_argument("--val_per_class", type=int, default=50)
    p.add_argument("--min_size", type=int, default=256)
    p.add_argument("--max_size", type=int, default=352)
    p.add_argument("--quality", type=int, default=87)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--list_dir", default=None,
                   help="where to write the list files (default: out_root)")
    args = p.parse_args()

    os.makedirs(args.out_root, exist_ok=True)
    list_dir = args.list_dir or args.out_root
    train_lines, val_lines = [], []
    for label in range(args.num_classes):
        crng = np.random.default_rng((args.seed, label))
        recipe = class_recipe(label, crng)
        cls_dir = f"class_{label:03d}"
        os.makedirs(os.path.join(args.out_root, cls_dir), exist_ok=True)
        n = args.train_per_class + args.val_per_class
        for i in range(n):
            irng = np.random.default_rng((args.seed, label, i))
            size = int(irng.integers(args.min_size, args.max_size + 1))
            img = render(recipe, irng, size)
            rel = f"{cls_dir}/img_{i:05d}.jpg"
            path = os.path.join(args.out_root, rel)
            if not os.path.exists(path):
                Image.fromarray(img).save(path, quality=args.quality)
            (train_lines if i < args.train_per_class
             else val_lines).append(f"{rel} {label}")
        if (label + 1) % 10 == 0:
            print(f"{label + 1}/{args.num_classes} classes done")

    tr = os.path.join(list_dir, "proxy_train.txt")
    va = os.path.join(list_dir, "proxy_val.txt")
    with open(tr, "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(va, "w") as f:
        f.write("\n".join(val_lines) + "\n")
    print(f"{len(train_lines)} train -> {tr}")
    print(f"{len(val_lines)} val -> {va}")


if __name__ == "__main__":
    main()
