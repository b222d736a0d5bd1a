#!/usr/bin/env python
"""Boost the ViT candidate's alpha in a hybrid search checkpoint.

Demonstrates the hybrid round-trip end-to-end (VERDICT round-1 item 9):
after a short `--space hybrid` search on real JPEGs, bump log_alphas for
the ViT op (index 8) at one or more valid blocks so parsing elects a
ViTBlock, then parse -> model.config (which serializes a ViTBlock entry)
-> retrain through train_eval.py -> test.py.

The edit happens host-side on the pickled checkpoint — no device work —
and renormalizes via log_softmax over the valid ops exactly like the
post-arch-step projection (train_search.py reference :421-422).

Usage: python tools_seed_vit_alpha.py --ckpt .../searched_model_02.pkl \
           --out .../searched_model_02_vit.pkl [--blocks 12 15] [--boost 3.0]
"""

import argparse
import pickle

import numpy as np


def log_softmax(v):
    v = v - v.max()
    return v - np.log(np.exp(v).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--blocks", type=int, nargs="+", default=None,
                    help="block indices to boost (default: every "
                         "ViT-valid block)")
    ap.add_argument("--boost", type=float, default=3.0,
                    help="added to the ViT logit before renormalizing")
    args = ap.parse_args()

    from tfnas_tpu.models import hybrid_space as hs

    with open(args.ckpt, "rb") as f:
        ckpt = pickle.load(f)
    la = np.array(ckpt["arch_params"]["log_alphas"], np.float32)
    if la.shape[1] != hs.NUM_OPS:
        raise SystemExit(f"not a hybrid checkpoint: log_alphas {la.shape}")
    valid = np.asarray(hs.valid_op_mask(), bool)          # [18, 9]
    vit_blocks = [i for i in range(la.shape[0]) if valid[i, 8]]
    blocks = args.blocks if args.blocks is not None else vit_blocks
    for b in blocks:
        if b not in vit_blocks:
            raise SystemExit(f"block {b} has no ViT candidate "
                             f"(valid: {vit_blocks})")
        row = la[b].copy()
        row[8] += args.boost
        # renormalize over valid ops only; invalid stay at the sentinel
        row[valid[b]] = log_softmax(row[valid[b]])
        la[b] = row
        print(f"block {b}: exp(alpha)[vit] = {np.exp(la[b, 8]):.4f}")
    ckpt["arch_params"]["log_alphas"] = la
    with open(args.out, "wb") as f:
        pickle.dump(ckpt, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
