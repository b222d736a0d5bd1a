#!/usr/bin/env python
"""Learnability probe for the procedural proxy dataset (v2, compositional).

Round-3 motivation: the first proxy-v2 search run
(checkpoints_e2e/search-20260819-043710-proxy2-e2e) sat at EXACT chance
(top-1 ~1%, CE ~ln(100)) for 9 epochs while the v1 dataset reached 27% by
epoch 7 under the identical pipeline. Before relaunching a multi-hour
search we need to know which link is broken:

  (a) the TASK — is v2 learnable at all by direct supervised training?
  (b) the AUGMENTATION — does ImageNet-strength RandomResizedCrop
      (area 0.08-1.0) destroy the compositional label?
  (c) the PIPELINE — JPEG round trip + C++ decode/augment + DataLoader +
      uint8 path (--from_disk mode: same tiny CNN, batches from the REAL
      ImageList/DataLoader path on the on-disk dataset)
  (d) the SEARCH — supernet weight-sharing dynamics (not probed here).

Round-3 findings (committed for the record; full JSONs in /tmp logs):
  in-memory @64px crop of 72px, 500 steps bs 256, Adam 2e-3:
    coarse/center 32.3%  coarse/rrc 64.6%  fine/center 15.8%
    fine/rrc 33.6%  full/center was off chance (4.60->2.69) at cutoff.
  => the v2 TASK is learnable and rrc(0.08) is a regularizer, not a
     label-destroyer, at probe scale. A search run sitting at EXACT chance
     therefore indicts the pipeline or the supernet dynamics, not the data.

Method: generate v2 images IN MEMORY (same render_example as
dataset/make_proxy_dataset.py — no JPEG/loader in the loop), train a tiny
4-conv CNN on the attached accelerator, and report val top-1 for three
label projections x two augmentation regimes:

  task  = full (100-way) | coarse (label%10) | fine (label//10)
  aug   = center (deterministic center crop) | rrc (area 0.08-1.0 + hflip)

Interpretation: coarse/center >> 10% but full/rrc ~ 1% means the task is
fine and the augmentation is the killer; everything at chance means the
task itself needs simplification.

Reference anchor: the real recipe trains on ImageNet-100 with these augs
(/root/reference/train_search.py:124-141); the proxy stands in for it on a
box without ImageNet.

Round-4 v3 gate findings (60-way, chance 1.67%; /tmp/v3_probe*.json):
  full/rrc stem-only(48):        2.9%  val top-1  (60 train/class)
  full/rrc deep(32,64,128,256):  9.8%  val top-1  (60 train/class)
  full/rrc deep, 150/class:     22.1%  val top-1  (2500 steps)
  => capacity separation exists (3.3x stem->deep) and the deep probe
     MEMORIZES (train loss 0.89) while generalizing at 9.8->22.1% as data
     grows — v3 is generalization-bound, the axis the family rescore
     needs. Gate PASSED; /root/data/proxy60 generated at 150 train/class.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from dataset.make_proxy_dataset import (render_example,  # noqa: E402
                                        render_example_v3)


def gen_split(n_per_class, num_classes, gen_size, seed, tag, version=2):
    """[N,H,W,3] uint8 + labels, deterministic per (seed, tag, version)."""
    render = render_example_v3 if version == 3 else render_example
    imgs = np.empty((num_classes * n_per_class, gen_size, gen_size, 3),
                    np.uint8)
    labels = np.empty((num_classes * n_per_class,), np.int32)
    k = 0
    for label in range(num_classes):
        for i in range(n_per_class):
            rng = np.random.default_rng((seed, label, i, hash(tag) % 2**31,
                                         version))
            # render at fixed gen_size (no per-image size jitter: the crop
            # regime below is the variable under test)
            imgs[k] = render(label, rng, gen_size)
            labels[k] = label
            k += 1
    return imgs, labels


def build_tiny_cnn(jax, jnp, depth_chs=(32, 64, 128, 256)):
    """4x stride-2 conv + BN + relu -> GAP -> linear. Input: uint8/float
    NHWC; normalization (x/255 - 0.5) is inside forward so the probe is
    agnostic to the feeding path."""

    def init_params(key, num_out):
        params = []
        cin = 3
        for ch in depth_chs:
            key, k1 = jax.random.split(key)
            w = jax.random.normal(k1, (3, 3, cin, ch), jnp.float32)
            w = w * np.sqrt(2.0 / (9 * cin))
            params.append({"w": w, "b": jnp.zeros((ch,)),
                           "g": jnp.ones((ch,)), "be": jnp.zeros((ch,))})
            cin = ch
        key, k1 = jax.random.split(key)
        wf = jax.random.normal(k1, (cin, num_out), jnp.float32) * 0.01
        return {"convs": params, "wf": wf, "bf": jnp.zeros((num_out,))}

    def forward(params, x):
        x = x.astype(jnp.float32) / 255.0 - 0.5
        for lyr in params["convs"]:
            x = jax.lax.conv_general_dilated(
                x, lyr["w"], (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            m = x.mean((0, 1, 2))
            v = x.var((0, 1, 2))
            x = (x - m) * jax.lax.rsqrt(v + 1e-5) * lyr["g"] + lyr["be"]
            x = jax.nn.relu(x)
        x = x.mean((1, 2))
        return x @ params["wf"] + params["bf"]

    return init_params, forward


def run_from_disk(args, jax, jnp, optax):
    """Pipeline probe: the same tiny CNN, but every batch comes from the
    REAL loader (ImageList 'uint8' output -> C++ libjpeg decode + fused
    augment -> threaded DataLoader), exactly as train_search.py feeds the
    supernet. If the in-memory probe learns and this one doesn't, the bug
    is in the JPEG/decode/augment/collate path; if both learn, the search
    dynamics are the remaining suspect."""
    from tfnas_tpu.data import ImageList, DataLoader

    root = args.from_disk
    train_ds = ImageList(root, f"{root}/proxy_train.txt", training=True,
                         image_size=args.image_size, output="uint8",
                         rrc_scale=(args.rrc_min_scale, 1.0))
    val_ds = ImageList(root, f"{root}/proxy_val.txt", training=False,
                       image_size=args.image_size, output="uint8")
    tl = DataLoader(train_ds, args.batch_size, shuffle=True, num_workers=1,
                    seed=args.seed)
    vl = DataLoader(val_ds, args.batch_size, shuffle=False, num_workers=1,
                    drop_last=False, pad_last=True)

    depth_chs = tuple(int(c) for c in args.depth_chs.split(","))
    init_params, forward = build_tiny_cnn(jax, jnp, depth_chs)
    params = init_params(jax.random.PRNGKey(args.seed + 1), args.num_classes)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = forward(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, upd)
        return params, opt_state, loss

    @jax.jit
    def count_correct(params, x, y, n_valid):
        logits = forward(params, x)
        ok = (jnp.argmax(logits, -1) == y)
        mask = jnp.arange(x.shape[0]) < n_valid
        return (ok & mask).sum()

    t0 = time.time()
    s = 0
    epoch = 0
    losses = []
    while s < args.steps:
        tl.set_epoch(epoch)
        for x, y in tl:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x), jnp.asarray(y))
            if s % 50 == 0:
                losses.append(float(loss))
                print(f"[disk/{args.image_size}px/rrc{args.rrc_min_scale}] "
                      f"step {s} loss {losses[-1]:.3f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
            s += 1
            if s >= args.steps:
                break
        epoch += 1

    correct, total = 0.0, 0
    for batch in vl:
        x, y, n_valid = batch
        correct += float(count_correct(params, jnp.asarray(x),
                                       jnp.asarray(y), n_valid))
        total += int(n_valid)
    acc = correct / max(total, 1)
    print(f"[disk] val top-1 {acc*100:.1f}% (chance "
          f"{100.0/args.num_classes:.0f}%) over {total} samples", flush=True)
    out = {"disk/val_top1": acc, "final_loss": losses[-1],
           "steps": args.steps, "image_size": args.image_size,
           "rrc_min_scale": args.rrc_min_scale}
    print(json.dumps(out, indent=1))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_per_class", type=int, default=60)
    p.add_argument("--val_per_class", type=int, default=15)
    p.add_argument("--num_classes", type=int, default=100)
    p.add_argument("--gen_size", type=int, default=96)
    p.add_argument("--crop", type=int, default=64)
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tasks", default="coarse,fine,full")
    p.add_argument("--augs", default="center,rrc")
    p.add_argument("--json_out", default="")
    p.add_argument("--from_disk", default="",
                   help="dataset root (e.g. /root/data/proxy100): train the "
                        "same tiny CNN from the REAL on-disk pipeline "
                        "(C++ JPEG decode -> fused augment -> DataLoader -> "
                        "uint8 device path) instead of in-memory renders. "
                        "Isolates pipeline bugs from task difficulty.")
    p.add_argument("--image_size", type=int, default=96,
                   help="from_disk crop size fed to ImageList")
    p.add_argument("--rrc_min_scale", type=float, default=0.08)
    p.add_argument("--platform", default="",
                   help="'cpu' to force the CPU backend (the axon plugin "
                        "overrides JAX_PLATFORMS, so this must go through "
                        "jax.config — see CLAUDE.md)")
    p.add_argument("--version", type=int, default=2, choices=(2, 3),
                   help="proxy generator version (3 = capacity-graded)")
    p.add_argument("--depth_chs", default="32,64,128,256",
                   help="comma-separated conv channels of the probe CNN — "
                        "the CAPACITY axis: e.g. '48' (stem-only, 1 conv) "
                        "vs '32,64,128,256' (deep). '|'-separated settings "
                        "run back-to-back on the same generated data. "
                        "VERDICT r3 gate: a stem-only probe must score "
                        "well below a deep one on the v3 task")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    if args.from_disk:
        run_from_disk(args, jax, jnp, optax)
        return

    t0 = time.time()
    tr_x, tr_y = gen_split(args.train_per_class, args.num_classes,
                           args.gen_size, args.seed, "train", args.version)
    va_x, va_y = gen_split(args.val_per_class, args.num_classes,
                           args.gen_size, args.seed, "val", args.version)
    print(f"generated {len(tr_x)} train / {len(va_x)} val "
          f"@{args.gen_size}px in {time.time()-t0:.0f}s", flush=True)

    # whole dataset lives on device; batches are gathered on device so the
    # 1-core host + relay RTT stay out of the training loop entirely
    tr_xd = jax.device_put(tr_x)
    va_xd = jax.device_put(va_x)

    C = args.crop

    def crop_batch(xd, idx, key, aug):
        """Gather a batch from the on-device dataset and crop to C x C."""
        imgs = xd[idx]  # [B, S, S, 3]
        S = args.gen_size
        if aug == "center":
            o = (S - C) // 2
            return jax.lax.dynamic_slice(
                imgs, (0, o, o, 0), (imgs.shape[0], C, C, 3))
        # rrc: per-batch random square window, area in [0.08, 1.0] of the
        # source, resized to C (shared across the batch so shapes are
        # static; randomness over steps still covers the regime), plus
        # per-image hflip
        k1, k2, k3 = jax.random.split(key, 3)
        area = jax.random.uniform(k1, (), minval=0.08, maxval=1.0)
        side = jnp.sqrt(area) * S
        side = jnp.clip(side, 8, S).astype(jnp.int32)
        max_off = S - side
        offy = jax.random.randint(k2, (), 0, 1 << 30) % (max_off + 1)
        offx = jax.random.randint(k3, (), 0, 1 << 30) % (max_off + 1)
        # dynamic_slice needs static sizes -> slice the max then mask via
        # resize with computed scale: use lax.dynamic_slice with full S and
        # scale-resize by gather of computed source coords (nearest).
        ys = (jnp.arange(C) + 0.5) / C * side + offy
        xs = (jnp.arange(C) + 0.5) / C * side + offx
        ys = jnp.clip(ys.astype(jnp.int32), 0, S - 1)
        xs = jnp.clip(xs.astype(jnp.int32), 0, S - 1)
        out = imgs[:, ys][:, :, xs]
        flip = jax.random.bernoulli(k1, 0.5, (imgs.shape[0], 1, 1, 1))
        return jnp.where(flip, out[:, :, ::-1], out)

    n_coarse = 5 if args.version == 3 else 10
    n_fine = 12 if args.version == 3 else 10
    results = {}
    chs_settings = [tuple(int(c) for c in s.split(","))
                    for s in args.depth_chs.split("|")]
    for depth_chs in chs_settings:
        init_params, forward = build_tiny_cnn(jax, jnp, depth_chs)
        _probe_tasks(args, jax, jnp, optax, results, depth_chs,
                     init_params, forward, crop_batch,
                     tr_x, tr_y, va_x, va_y, tr_xd, va_xd,
                     n_coarse, n_fine, C, len(chs_settings) > 1)

    print(json.dumps(results, indent=1))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)


def _probe_tasks(args, jax, jnp, optax, results, depth_chs, init_params,
                 forward, crop_batch, tr_x, tr_y, va_x, va_y, tr_xd, va_xd,
                 n_coarse, n_fine, C, tag_chs):
    for task in args.tasks.split(","):
        if task == "coarse":
            proj = lambda y: y % n_coarse
            n_out = n_coarse
        elif task == "fine":
            proj = lambda y: y // n_coarse
            n_out = n_fine
        else:
            proj = lambda y: y
            n_out = args.num_classes
        tr_yp = jnp.asarray(proj(tr_y))
        va_yp = jnp.asarray(proj(va_y))

        for aug in args.augs.split(","):
            key = jax.random.PRNGKey(args.seed + 1)
            params = init_params(key, n_out)
            opt = optax.adam(args.lr)
            opt_state = opt.init(params)

            @jax.jit
            def step(params, opt_state, key, _tr_yp=tr_yp, _aug=aug):
                k1, k2, key = jax.random.split(key, 3)
                idx = jax.random.randint(
                    k1, (args.batch_size,), 0, len(tr_x))
                x = crop_batch(tr_xd, idx, k2, _aug)
                y = _tr_yp[idx]

                def loss_fn(p):
                    logits = forward(p, x)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, y).mean()

                loss, grads = jax.value_and_grad(loss_fn)(params)
                upd, opt_state = opt.update(grads, opt_state)
                params = optax.apply_updates(params, upd)
                return params, opt_state, key, loss

            @jax.jit
            def val_acc(params):
                o = (args.gen_size - C) // 2
                correct = 0.0
                B = 250
                for s in range(0, len(va_x), B):
                    e = min(s + B, len(va_x))  # remainder-safe tail batch
                    x = va_xd[s:e, o:o + C, o:o + C]
                    logits = forward(params, x)
                    correct += (jnp.argmax(logits, -1)
                                == va_yp[s:e]).sum()
                return correct / len(va_x)

            chs_s = ",".join(str(c) for c in depth_chs)
            tag = f"{task}/{aug}" + (f"/chs={chs_s}" if tag_chs else "")
            t1 = time.time()
            losses = []
            for s in range(args.steps):
                params, opt_state, key, loss = step(params, opt_state, key)
                if s % 100 == 0:
                    losses.append(float(loss))
                    print(f"[{tag}] step {s} loss {losses[-1]:.3f}",
                          flush=True)
            acc = float(val_acc(params))
            dt = time.time() - t1
            chance = 1.0 / n_out
            print(f"[{tag}] val top-1 {acc*100:.1f}% "
                  f"(chance {chance*100:.0f}%) in {dt:.0f}s", flush=True)
            results[tag] = {
                "val_top1": acc, "chance": chance,
                "final_loss": losses[-1], "steps": args.steps}


if __name__ == "__main__":
    main()
