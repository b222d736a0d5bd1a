#!/usr/bin/env python
"""Summarize a search run's convergence evidence from its run dir.

Reads log.txt + the per-epoch searched_model_*.pkl checkpoints and reports:
  (a) per-epoch train loss / accuracy (is the supernet learning?)
  (b) per-epoch mean alpha entropy + per-block argmax stability (are the
      operation choices converging?)
  (c) per-epoch parsed-arch LUT latency vs --target_lat (is elasticity
      tracking the constraint?)
  (d) the final parsed architecture + FLOPs (does it land in a TF-NAS
      FLOPs class?)

Usage: python tools_search_report.py --run_dir checkpoints_e2e/search-*/ \
           --lookup_path latency_pkl/latency_tpu_v5e_bs32.pkl
"""

import argparse
import glob
import json
import os
import re

import numpy as np


def parse_log(run_dir):
    """[(epoch, loss, top1)], [(before_lat, after_lat, target)] from
    log.txt."""
    epochs, lats, vals = [], [], []
    loss = top1 = None
    with open(os.path.join(run_dir, "log.txt")) as f:
        for line in f:
            m = re.search(r"TRAIN.*Objs: ([\d.]+) R1: ([\d.]+)", line)
            if m:
                loss, top1 = float(m.group(1)), float(m.group(2))
            m = re.search(r"Train_acc ([\d.]+)", line)
            if m:
                epochs.append((len(epochs), loss, float(m.group(1))))
            m = re.search(
                r"Before, the current lat: ([\d.]+), the target lat: "
                r"([\d.]+)", line)
            if m:
                lats.append([float(m.group(1)), None, float(m.group(2))])
            m = re.search(r"After, the current lat: ([\d.]+)", line)
            if m and lats and lats[-1][1] is None:
                lats[-1][1] = float(m.group(1))
            m = re.search(r"Val_acc ([\d.]+)", line)
            if m:
                vals.append(float(m.group(1)))
    return epochs, lats, vals


def alpha_stats(ckpt_paths):
    """Per-checkpoint (mean entropy in nats, argmax list) of exp(alpha)."""
    import pickle
    out = []
    for p in ckpt_paths:
        with open(p, "rb") as f:
            ck = pickle.load(f)
        la = np.asarray(ck["arch_params"]["log_alphas"], np.float64)
        prob = np.exp(la)
        prob = prob / prob.sum(-1, keepdims=True)
        ent = -(prob * np.log(np.maximum(prob, 1e-12))).sum(-1).mean()
        betas = {}
        for stage, b in ck["arch_params"]["betas"].items():
            b = np.asarray(b, np.float64)
            e = np.exp(b - b.max())
            betas[stage] = (e / e.sum()).tolist()
        vit = prob[:, 8].tolist() if prob.shape[-1] > 8 else None
        out.append((int(ck["epoch"]), float(ent),
                    prob.argmax(-1).tolist(), betas, vit))
    return out


def main():
    from tfnas_tpu.utils.platform import honor_cpu_platform_request
    honor_cpu_platform_request()
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--lookup_path",
                   default="latency_pkl/latency_tpu_v5e_bs32.pkl")
    p.add_argument("--json_out", default="")
    p.add_argument("--space", default="mbconv", choices=["mbconv", "hybrid"],
                   help="space the run searched; hybrid only changes the "
                        "uniform-entropy reference (9 ops incl. ViT) — "
                        "parsing is op-index driven and shared")
    args = p.parse_args()
    run_dir = glob.glob(args.run_dir)[0] if "*" in args.run_dir \
        else args.run_dir

    epochs, lats, vals = parse_log(run_dir)
    print("== (a) training curve (last logged step per epoch) ==")
    for e, loss, acc in epochs:
        print(f"epoch {e:2d}: loss {loss:.4f}  train_acc {acc:.2f}%")
    if vals:
        print("val_acc (last epochs):", [round(v, 2) for v in vals])

    # per-epoch arch trajectory: prefer the tiny arch_params_NN.pkl dumps
    # (saved every epoch even when --save_freq skips full checkpoints)
    ckpts = sorted(glob.glob(os.path.join(run_dir, "arch_params_*.pkl"))) \
        or sorted(glob.glob(os.path.join(run_dir, "searched_model_*.pkl")))
    stats = alpha_stats(ckpts)
    max_ent = float(np.log(9 if args.space == "hybrid" else 8))
    print(f"\n== (b) alpha entropy (uniform = {max_ent:.3f} nats) ==")
    prev_argmax = None
    for ep, ent, am, _, _ in stats:
        flips = (sum(a != b for a, b in zip(am, prev_argmax))
                 if prev_argmax is not None else "-")
        print(f"ckpt epoch {ep:2d}: mean entropy {ent:.4f}  "
              f"argmax flips vs prev: {flips}")
        prev_argmax = am
    print("final argmax ops per block:", stats[-1][2])

    # hybrid space: where does the 9th (ViT) candidate's probability mass
    # go, and when do blocks elect it?
    if stats[-1][4] is not None:
        print("\n== (b1) ViT candidate (op 8) trajectory ==")
        for ep, _, am, _, vit in stats:
            elected = sum(a == 8 for a in am)
            print(f"ckpt epoch {ep:2d}: blocks with argmax=ViT: {elected:2d}"
                  f"  mean p(ViT) {np.mean(vit):.4f}"
                  f"  max p(ViT) {np.max(vit):.4f}")
        final = stats[-1][4]
        print("final per-block p(ViT):",
              [round(v, 3) for v in final])

    # depth freedom: the sink-connecting betas' softmax per stage
    # (model_search.py:157-206) — did depth move away from uniform, and
    # did any stage keep depth > 1?
    print("\n== (b2) depth betas: softmax per stage (first -> last ckpt) ==")
    first_b, last_b = stats[0][3], stats[-1][3]
    for stage in last_b:
        f = " ".join(f"{v:.2f}" for v in first_b[stage])
        l = " ".join(f"{v:.2f}" for v in last_b[stage])
        am = int(np.argmax(last_b[stage])) + 1
        print(f"{stage}: [{f}] -> [{l}]  parsed depth {am}")
    parsed_depths = [int(np.argmax(last_b[s])) + 1 for s in last_b]
    print(f"stages with parsed depth >= 2: "
          f"{sum(d >= 2 for d in parsed_depths)}/{len(parsed_depths)}")

    print("\n== (c) elasticity: parsed-arch LUT latency vs target ==")
    for i, (before, after, target) in enumerate(lats):
        print(f"epoch {i + len(epochs) - len(lats):2d}: before {before:.4f} "
              f"-> after {after:.4f}  (target {target:.4f}, "
              f"err {abs(after - target) / target * 100:.1f}%)")

    # (d) parse the final checkpoint into a config + FLOPs
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tfnas_tpu.search.parser import (get_mc_num_dddict,
                                         get_op_and_depth_weights,
                                         parse_architecture)
    from tfnas_tpu.models.eval_net import EvalNetwork
    from tfnas_tpu.cost.flops import calculate_FLOPs_in_M

    final = ckpts[-1]
    op_w, depth_w = get_op_and_depth_weights(final)
    parsed = parse_architecture(op_w, depth_w)
    import pickle
    with open(final, "rb") as f:
        mc_mask = pickle.load(f)["mc_mask_dddict"]
    mc_num = get_mc_num_dddict(mc_mask)
    net = EvalNetwork.from_parsed_arch(1000, parsed, mc_num)
    flops = calculate_FLOPs_in_M(net, input_size=224)
    n_params = sum(int(np.prod(np.asarray(v).shape)) for v in
                   __import__("jax").tree_util.tree_leaves(
                       net.init(__import__("jax").random.PRNGKey(0))[0]))
    print("\n== (d) final parsed architecture ==")
    print("parsed depths:", {s: len(parsed[s]) for s in parsed})
    print(f"FLOPs: {flops:.1f}M  params: {n_params / 1e6:.2f}M")
    classes = {"TF-NAS-A": 457, "TF-NAS-B": 361, "TF-NAS-C": 284,
               "TF-NAS-D": 219}
    nearest = min(classes, key=lambda k: abs(classes[k] - flops))
    print(f"nearest reference FLOPs class: {nearest} "
          f"({classes[nearest]}M)")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({
                "train": epochs, "lat": lats, "val": vals,
                "alpha": [(e, ent) for e, ent, _, _ in stats],
                "final_argmax": stats[-1][2],
                "betas_first": stats[0][3], "betas_last": stats[-1][3],
                "flops_M": round(flops, 1),
                "params_M": round(n_params / 1e6, 2),
                "nearest_class": nearest,
            }, f, indent=1)
        print("wrote", args.json_out)


if __name__ == "__main__":
    main()
