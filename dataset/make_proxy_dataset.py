#!/usr/bin/env python
"""Generate a procedural real-JPEG classification dataset (v2, compositional).

Purpose: exercise the FULL search pipeline — C++ libjpeg decode, fused
augment, threaded loader, elasticity on a measured LUT — end-to-end on a
box without ImageNet (the reference recipe trains on ImageNet-100,
/root/reference/train_search.py:124-153), with a task hard enough that the
DEPTH search freedom (sink-connecting betas,
/root/reference/models/model_search.py:157-206) is genuinely exercised.

v1 flaw (round-2 evidence, docs/E2E_PROXY_RUN.md): classes had FIXED hue
pairs, so a color histogram — computable by the stem alone — separated all
100 classes and every stage's beta collapsed to depth 1. v2 removes every
shortcut:

  * class = (fine texture F_a, coarse structure S_b), label = 10*a + b;
  * the image is the coarse structure's binary mask M (minority "figure"
    region, ~35% area) filled with fine texture F_a, while the majority
    "ground" region is filled with a per-image DISTRACTOR texture drawn
    from the other 9 fine textures;
  * all four region colors are randomized per image (uniform hue, random
    light/dark assignment), so color carries zero class information;
  * fine textures and coarse structures are SHAPE-defined (stripe/checker/
    ring/blob/grid/zigzag/dot families at different duty/orientation) and
    chosen to survive horizontal flips and RandomResizedCrop scale jitter.

Consequence: a bag-of-textures classifier (no spatial binding) sees the
unordered pair {F_a, distractor} plus the coarse layout — a ~50% top-1
ceiling. Beating it requires binding "which texture is inside the minority
region", i.e. feature composition across scales — the kind of computation
extra per-stage depth buys.

Output layout mirrors ImageNet: <out_root>/class_<label>/<name>.jpg plus
'relpath label' list files consumable by tfnas_tpu.data.ImageList.

Usage:
    python dataset/make_proxy_dataset.py --out_root /root/data/proxy100 \
        --num_classes 100 --train_per_class 140 --val_per_class 30
"""

import argparse
import os

import numpy as np

N_FINE = 10     # fine-texture identities (label // 10)
N_COARSE = 10   # coarse-structure identities (label % 10)


def _coords(size, rng, jitter=0.05):
    """Image-plane coordinates with a small per-image rotation jitter."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    a = rng.normal(0.0, jitter)
    ca, sa = np.cos(a), np.sin(a)
    return ca * xx + sa * yy, -sa * xx + ca * yy


def fine_field(kind, size, rng):
    """Binary [size,size] float32 field for fine-texture identity `kind`.

    All 10 kinds are distinguishable by SHAPE under horizontal flip and
    ~3.5x scale jitter (RandomResizedCrop area 0.08-1.0): orientation
    classes are {0deg, 90deg, one diagonal}, plus checker/ring/blob/grid/
    zigzag/dot families. Frequency itself is NOT a class cue.
    """
    x, y = _coords(size, rng)
    f = 9.0 * rng.uniform(0.88, 1.15)
    ph = rng.uniform(0, 2 * np.pi)
    if kind == 0:    # horizontal stripes
        return (np.sin(2 * np.pi * f * y + ph) > 0).astype(np.float32)
    if kind == 1:    # vertical stripes
        return (np.sin(2 * np.pi * f * x + ph) > 0).astype(np.float32)
    if kind == 2:    # diagonal stripes (45deg; hflip maps to 135 — one class)
        return (np.sin(2 * np.pi * f * (x + y) * 0.7071 + ph) > 0).astype(np.float32)
    if kind == 3:    # axis-aligned checker
        return (((np.floor(f * x + ph / 6) + np.floor(f * y)) % 2)).astype(np.float32)
    if kind == 4:    # diagonal checker
        u, v = (x + y) * 0.7071, (x - y) * 0.7071
        return (((np.floor(f * u + ph / 6) + np.floor(f * v)) % 2)).astype(np.float32)
    if kind == 5:    # fine concentric rings, random center
        cx, cy = rng.uniform(0.25, 0.75, 2)
        r = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
        return (np.sin(2 * np.pi * f * r + ph) > 0).astype(np.float32)
    if kind == 6:    # smooth blobs
        field = (np.sin(2 * np.pi * f * x + ph)
                 + np.sin(2 * np.pi * f * 0.73 * y + 1.7 * ph))
        return (field > 0.0).astype(np.float32)
    if kind == 7:    # thin grid lines (not checker: line skeleton, low duty)
        gx = (f * x + ph / 6) % 1.0 < 0.28
        gy = (f * y) % 1.0 < 0.28
        return (gx | gy).astype(np.float32)
    if kind == 8:    # zigzag / chevron stripes
        tri = 2.0 * np.abs(((0.5 * f * y) % 1.0) - 0.5)
        return (np.sin(2 * np.pi * f * x + 2.6 * np.pi * tri + ph) > 0).astype(np.float32)
    # kind == 9: dot lattice (small discs, low duty — distinct from blobs)
    dx = ((f * x + ph / 6) % 1.0) - 0.5
    dy = ((f * y) % 1.0) - 0.5
    return (np.sqrt(dx * dx + dy * dy) < 0.29).astype(np.float32)


def coarse_mask(kind, size, rng):
    """Binary [size,size] float32 mask for coarse-structure identity `kind`.

    The `1` region is the minority "figure" (~35% area) so figure/ground is
    unambiguous even for periodic patterns. Low frequency (~2.5 cycles) so
    any RandomResizedCrop window contains both regions.
    """
    x, y = _coords(size, rng)
    f = 2.5 * rng.uniform(0.85, 1.2)
    ph = rng.uniform(0, 2 * np.pi)
    duty = 0.35            # figure fraction
    thr = np.cos(np.pi * duty)   # sin(t) > thr on `duty` of each period
    if kind == 0:    # horizontal bands (narrow band = figure)
        return (np.sin(2 * np.pi * f * y + ph) > thr).astype(np.float32)
    if kind == 1:    # vertical bands
        return (np.sin(2 * np.pi * f * x + ph) > thr).astype(np.float32)
    if kind == 2:    # diagonal bands
        return (np.sin(2 * np.pi * f * (x + y) * 0.7071 + ph) > thr).astype(np.float32)
    if kind == 3:    # square islands on a grid (asymmetric checker)
        sx = ((f * x + ph / 6) % 1.0) < 0.59
        sy = ((f * y) % 1.0) < 0.59
        return (sx & sy).astype(np.float32)
    if kind == 4:    # coarse concentric rings, near-central
        cx, cy = rng.uniform(0.4, 0.6, 2)
        r = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
        return (np.sin(2 * np.pi * f * r + ph) > thr).astype(np.float32)
    if kind == 5:    # pinwheel wedges (6 sectors, narrow sector = figure)
        cx, cy = rng.uniform(0.4, 0.6, 2)
        th = np.arctan2(y - cy, x - cx)
        return (np.sin(3.0 * th + ph) > thr).astype(np.float32)
    if kind == 6:    # coarse blobs
        field = (np.sin(2 * np.pi * f * x + ph)
                 + np.sin(2 * np.pi * f * 0.73 * y + 1.7 * ph))
        return (field > 0.9).astype(np.float32)
    if kind == 7:    # diamond islands (diagonal lattice of squares)
        u, v = (x + y) * 0.7071, (x - y) * 0.7071
        su = ((f * u + ph / 6) % 1.0) < 0.59
        sv = ((f * v) % 1.0) < 0.59
        return (su & sv).astype(np.float32)
    if kind == 8:    # thick grid bands (cross lattice)
        gx = ((f * x + ph / 6) % 1.0) < 0.19
        gy = ((f * y) % 1.0) < 0.19
        return (gx | gy).astype(np.float32)
    # kind == 9: big discs on a lattice
    dx = ((f * x + ph / 6) % 1.0) - 0.5
    dy = ((f * y) % 1.0) - 0.5
    return (np.sqrt(dx * dx + dy * dy) < 0.335).astype(np.float32)


# --------------------------------------------------------------------------
# v3: capacity-graded difficulty (round-4 redesign).
#
# v2's flaw (round-3 evidence, docs/E2E_PROXY30.md): the 30-class subset's
# three fine textures (h/v/diagonal stripes) are so distinct that every
# searched net from 189M to 366M FLOPs retrains to ~100% — the accuracy
# axis carries no capacity signal, so the family table cannot reproduce the
# reference zoo's top-1-vs-latency trade-off (/root/reference/README.md:20-25).
#
# v3 keeps the v2 compositional core (label = texture INSIDE the minority
# figure region; color carries zero information) and adds three levers that
# make accuracy degrade SMOOTHLY with model capacity instead of cliffing:
#
#   1. Graded fine-texture confusability: 12 fine kinds = 6 shape families
#      x 2 DUTY-CYCLE variants (on-fraction 0.25 vs 0.45, +-0.03 jitter).
#      Shape family is easy (any net); the within-family duty bin is a
#      precision discrimination (width/feature-count bound). Duty is
#      invariant to hflip and to RandomResizedCrop scale jitter, and the
#      light/dark color swap maps duty d to 1-d, so the pair {0.25, 0.45}
#      stays separated ({0.75, 0.55} complements collide with nothing).
#   2. Majority-texture binding: the ground distractor is the figure
#      texture's CONFUSABLE PARTNER with prob 0.5 (maximally adversarial
#      for bag-of-textures), and with prob 0.5 an inner mid-scale region
#      (~30% of the figure) is filled with a third texture — the label is
#      the figure's MAJORITY texture, so nets must area-weight what they
#      bind (3-scale composition: fine texture / inner region / coarse
#      figure).
#   3. Nuisance continuum: per-image noise sigma in [0.02, 0.12], optional
#      blur in [0, 1.1] px, JPEG quality in [70, 92] — each image lands at
#      a different SNR, so a net's accuracy is the fraction of the
#      continuum above its precision floor, not a step function.
#
# 60 classes = 12 fine x 5 coarse (label = 5*fine + coarse).

N_FINE_V3 = 12
N_COARSE_V3 = 5
# confusable partner: the other duty variant of the same shape family
V3_PARTNER = {k: k + 1 if k % 2 == 0 else k - 1 for k in range(N_FINE_V3)}


def _duty_thr(duty):
    """Threshold t such that sin(x) > t on `duty` of each period."""
    return np.cos(np.pi * duty)


def fine_field_v3(kind, size, rng):
    """Binary field for v3 fine kind: family = kind//2, duty variant =
    kind%2 (on-fraction 0.25 / 0.45, +-0.03 per-image jitter)."""
    x, y = _coords(size, rng)
    f = 9.0 * rng.uniform(0.88, 1.15)
    ph = rng.uniform(0, 2 * np.pi)
    duty = (0.25, 0.45)[kind % 2] + rng.uniform(-0.03, 0.03)
    fam = kind // 2
    if fam == 0:    # horizontal stripes
        return (np.sin(2 * np.pi * f * y + ph) > _duty_thr(duty)).astype(np.float32)
    if fam == 1:    # vertical stripes
        return (np.sin(2 * np.pi * f * x + ph) > _duty_thr(duty)).astype(np.float32)
    if fam == 2:    # diagonal stripes (45deg; hflip maps to 135 — one class)
        return (np.sin(2 * np.pi * f * (x + y) * 0.7071 + ph)
                > _duty_thr(duty)).astype(np.float32)
    if fam == 3:    # square islands (duty = on-fraction => side sqrt(duty))
        side = np.sqrt(duty)
        sx = ((f * x + ph / 6) % 1.0) < side
        sy = ((f * y) % 1.0) < side
        return (sx & sy).astype(np.float32)
    if fam == 4:    # dot lattice (duty = on-fraction => radius sqrt(duty/pi))
        r = np.sqrt(duty / np.pi)
        dx = ((f * x + ph / 6) % 1.0) - 0.5
        dy = ((f * y) % 1.0) - 0.5
        return (np.sqrt(dx * dx + dy * dy) < r).astype(np.float32)
    # fam == 5: concentric rings, random center
    cx, cy = rng.uniform(0.25, 0.75, 2)
    rr = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
    return (np.sin(2 * np.pi * f * rr + ph) > _duty_thr(duty)).astype(np.float32)


V3_COARSE_KINDS = (0, 2, 3, 4, 6)  # v2 ids: h-bands, diag-bands, islands,
#                                     rings, blobs — the 5 most distinct


def _blur(img, sigma, rng):
    """Cheap separable Gaussian blur (numpy-only; no scipy on this box)."""
    if sigma < 0.3:
        return img
    k = max(1, int(3 * sigma))
    ker = np.exp(-0.5 * (np.arange(-k, k + 1) / sigma) ** 2)
    ker = (ker / ker.sum()).astype(np.float32)
    pad = np.pad(img, ((k, k), (k, k), (0, 0)), mode="reflect")
    # separable convolve along H then W (kept vectorized over the other axes)
    out = np.einsum("t,thwc->hwc", ker,
                    np.stack([pad[i:i + img.shape[0], k:-k]
                              for i in range(2 * k + 1)]))
    pad2 = np.pad(out, ((0, 0), (k, k), (0, 0)), mode="reflect")
    out = np.einsum("t,htwc->hwc", ker,
                    np.stack([pad2[:, i:i + img.shape[1]]
                              for i in range(2 * k + 1)], axis=1))
    return out.astype(np.float32)


def render_example_v3(label, rng, size, corrupt=0.0):
    """One [size,size,3] uint8 image of v3 class `label` (= 5*fine + coarse).

    `corrupt` in [0,1] scales the nuisance continuum (blur/noise/vignette/
    contrast) from the training distribution (0) to a held-out harder
    render (1). The corruption parameters are drawn AFTER every scene-
    geometry draw, so for the same `rng` seed tuple the corrupted image
    depicts the IDENTICAL scene — an ImageNet-C-style covariate shift of
    the pinned val split, used to rank converged models whose clean
    accuracy saturates (docs/E2E_PROXY30.md "The v3 Pareto")."""
    fine_id, coarse_id = label // N_COARSE_V3, label % N_COARSE_V3

    # ground distractor: confusable partner with prob 0.5, else random other
    if rng.uniform() < 0.5:
        distractor = V3_PARTNER[fine_id]
    else:
        distractor = int(rng.integers(N_FINE_V3 - 1))
        if distractor >= fine_id:
            distractor += 1

    mask = coarse_mask(V3_COARSE_KINDS[coarse_id], size, rng)[..., None]
    tex_fig = fine_field_v3(fine_id, size, rng)[..., None]
    tex_gnd = fine_field_v3(distractor, size, rng)[..., None]

    c1f, c2f = _color_pair(rng)
    c1g, c2g = _color_pair(rng)
    fig = tex_fig * c1f + (1 - tex_fig) * c2f
    gnd = tex_gnd * c1g + (1 - tex_gnd) * c2g

    # inner mid-scale sub-region stratum: ~30% of the figure gets a THIRD
    # texture; the label stays the figure's MAJORITY texture
    if rng.uniform() < 0.5:
        inner_id = int(rng.integers(N_FINE_V3 - 1))
        if inner_id >= fine_id:
            inner_id += 1
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        # radius bounded so no rrc_min_scale>=0.35 crop can be
        # majority-inner (label noise would cap every net equally,
        # compressing the capacity separation this task exists to create)
        cx, cy = rng.uniform(0.2, 0.8, 2)
        rad = rng.uniform(0.16, 0.24)
        inner = ((xx - cx) ** 2 + (yy - cy) ** 2 < rad * rad)[..., None]
        tex_in = fine_field_v3(inner_id, size, rng)[..., None]
        c1i, c2i = _color_pair(rng)
        fig = np.where(inner, tex_in * c1i + (1 - tex_in) * c2i, fig)

    img = mask * fig + (1 - mask) * gnd
    # corrupt>0 scales blur with render size (resolution-invariant smear);
    # corrupt==0 must stay bit-identical to the pinned proxy60 renders
    sigma = rng.uniform(1.2 * corrupt, 1.1 + 1.7 * corrupt)
    if corrupt > 0.0:
        sigma *= size / 224.0
    img = _blur(img, sigma, rng)
    img = img + rng.normal(0, rng.uniform(0.02 + 0.10 * corrupt,
                                          0.12 + 0.14 * corrupt),
                           img.shape).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    cx, cy = rng.uniform(0.3, 0.7, 2)
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
    img = img * (1.0 - rng.uniform(0.0, 0.25 + 0.3 * corrupt) * d2)[..., None]
    if corrupt > 0.0:
        img = (img - 0.5) * rng.uniform(1.0 - 0.5 * corrupt, 1.0) + 0.5
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _hsv_to_rgb(h, s, v):
    i = np.floor(h * 6.0)
    fr = h * 6.0 - i
    p, q, t = v * (1 - s), v * (1 - s * fr), v * (1 - s * (1 - fr))
    i = int(i) % 6
    return [(v, t, p), (q, v, p), (p, v, t),
            (t, p, v), (p, q, v), (v, p, q)][i]


def _color_pair(rng):
    """One light + one dark random-hue color (keeps the pattern visible
    regardless of hue); order randomized so light/dark carries no signal."""
    light = np.asarray(_hsv_to_rgb(rng.uniform(0, 1), rng.uniform(0.3, 0.9),
                                   rng.uniform(0.65, 0.95)), np.float32)
    dark = np.asarray(_hsv_to_rgb(rng.uniform(0, 1), rng.uniform(0.3, 0.9),
                                  rng.uniform(0.15, 0.5)), np.float32)
    return (light, dark) if rng.uniform() < 0.5 else (dark, light)


def render_example(label, rng, size):
    """One [size,size,3] uint8 image of class `label` (= 10*fine + coarse)."""
    fine_id, coarse_id = label // N_COARSE, label % N_COARSE
    # per-image distractor texture != the class texture
    distractor = int(rng.integers(N_FINE - 1))
    if distractor >= fine_id:
        distractor += 1

    mask = coarse_mask(coarse_id, size, rng)[..., None]
    tex_fig = fine_field(fine_id, size, rng)[..., None]
    tex_gnd = fine_field(distractor, size, rng)[..., None]

    c1f, c2f = _color_pair(rng)
    c1g, c2g = _color_pair(rng)
    fig = tex_fig * c1f + (1 - tex_fig) * c2f
    gnd = tex_gnd * c1g + (1 - tex_gnd) * c2g
    img = mask * fig + (1 - mask) * gnd

    img = img + rng.normal(0, rng.uniform(0.02, 0.06),
                           img.shape).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    cx, cy = rng.uniform(0.3, 0.7, 2)
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
    img = img * (1.0 - rng.uniform(0.0, 0.25) * d2)[..., None]
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    from PIL import Image

    p = argparse.ArgumentParser()
    p.add_argument("--out_root", required=True)
    p.add_argument("--num_classes", type=int, default=100)
    p.add_argument("--train_per_class", type=int, default=140)
    p.add_argument("--val_per_class", type=int, default=30)
    p.add_argument("--min_size", type=int, default=256)
    p.add_argument("--max_size", type=int, default=352)
    p.add_argument("--quality", type=int, default=87)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--list_dir", default=None,
                   help="where to write the list files (default: out_root)")
    p.add_argument("--version", type=int, default=2, choices=(2, 3),
                   help="2: round-3 compositional task (saturates for "
                        ">=189M-FLOP nets); 3: capacity-graded task "
                        "(60 classes = 12 fine x 5 coarse)")
    p.add_argument("--corrupt", type=float, default=0.0,
                   help="v3 only: nuisance severity in [0,1]. With the "
                        "same --seed the scenes are identical to the "
                        "corrupt=0 render (corruption draws come after "
                        "all geometry draws) — an ImageNet-C-style "
                        "covariate shift of the pinned split. Per-image "
                        "JPEG quality also drops with severity.")
    p.add_argument("--val_only", action="store_true",
                   help="render/list only the val tail of each class "
                        "(indices keep their train+val positions, so the "
                        "val scenes match a full render of the same seed)")
    args = p.parse_args()
    if args.version == 3:
        assert args.num_classes <= N_FINE_V3 * N_COARSE_V3
    else:
        assert args.num_classes <= N_FINE * N_COARSE
        assert args.corrupt == 0.0, "--corrupt is a v3 knob"

    os.makedirs(args.out_root, exist_ok=True)
    list_dir = args.list_dir or args.out_root
    train_lines, val_lines = [], []
    for label in range(args.num_classes):
        cls_dir = f"class_{label:03d}"
        os.makedirs(os.path.join(args.out_root, cls_dir), exist_ok=True)
        n = args.train_per_class + args.val_per_class
        for i in range(n):
            if args.val_only and i < args.train_per_class:
                continue
            irng = np.random.default_rng((args.seed, label, i, args.version))
            size = int(irng.integers(args.min_size, args.max_size + 1))
            if args.version == 3:
                img = render_example_v3(label, irng, size,
                                        corrupt=args.corrupt)
            else:
                img = render_example(label, irng, size)
            quality = args.quality
            if args.corrupt > 0.0:
                # severity also degrades the JPEG encode (drawn last, so
                # the image content above is unaffected)
                lo = args.quality - int(50 * args.corrupt)
                hi = args.quality - int(28 * args.corrupt)
                quality = int(irng.integers(lo, hi + 1))
            rel = f"{cls_dir}/img_{i:05d}.jpg"
            path = os.path.join(args.out_root, rel)
            if not os.path.exists(path):
                Image.fromarray(img).save(path, quality=quality)
            (train_lines if i < args.train_per_class
             else val_lines).append(f"{rel} {label}")
        if (label + 1) % 10 == 0:
            print(f"{label + 1}/{args.num_classes} classes done", flush=True)

    tr = os.path.join(list_dir, "proxy_train.txt")
    va = os.path.join(list_dir, "proxy_val.txt")
    if train_lines:
        with open(tr, "w") as f:
            f.write("\n".join(train_lines) + "\n")
        print(f"{len(train_lines)} train -> {tr}")
    with open(va, "w") as f:
        f.write("\n".join(val_lines) + "\n")
    print(f"{len(val_lines)} val -> {va}")


if __name__ == "__main__":
    main()
