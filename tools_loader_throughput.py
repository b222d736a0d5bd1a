#!/usr/bin/env python
"""Measure input-pipeline throughput (images/sec) of the threaded DataLoader
over a real image list — the number that must exceed the chip's consumption
rate (search: steps/sec x batch_size) for the search to not be input-bound.

Reference context: the reference feeds one Titan RTX at ~1.85 steps/s x bs32
= 59 img/s from 4 DataLoader workers (train_search.py:124-153); our chip
consumes ~600 img/s at the measured 18.8 steps/s.

Usage:
    python tools_loader_throughput.py --img_root /data/proxy100 \
        --list /data/proxy100/proxy_train.txt [--val] [--no_native] \
        [--workers 4] [--batches 40]
"""

import argparse
import json
import time

import numpy as np

from tfnas_tpu.data import DataLoader, ImageList


def measure(ds, batch_size, workers, n_batches, seed=0):
    dl = DataLoader(ds, batch_size, shuffle=True, num_workers=workers,
                    seed=seed)
    it = iter(dl)
    # warm one batch (thread pool spin-up, page cache)
    next(it)
    tic = time.perf_counter()
    n = 0
    for _ in range(n_batches):
        x, y = next(it)
        n += len(y)
    dt = time.perf_counter() - tic
    # drain/stop the producer thread
    del it
    return n / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img_root", required=True)
    p.add_argument("--list", dest="list_path", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--batches", type=int, default=40)
    p.add_argument("--val", action="store_true",
                   help="val transform (resize+crop) instead of train RRC")
    p.add_argument("--no_native", action="store_true",
                   help="force the PIL fallback path")
    p.add_argument("--chip_steps_per_sec", type=float, default=0.0,
                   help="optional: chip consumption rate for the verdict "
                        "line (steps/sec at this batch size)")
    args = p.parse_args()

    ds = ImageList(args.img_root, args.list_path, training=not args.val,
                   use_native=(False if args.no_native else "auto"))
    print(f"dataset: {len(ds)} images, native={ds.use_native}, "
          f"training={ds.training}")
    rate = measure(ds, args.batch_size, args.workers, args.batches)
    out = {"metric": "loader_images_per_sec", "value": round(rate, 1),
           "native": ds.use_native, "workers": args.workers,
           "batch_size": args.batch_size}
    if args.chip_steps_per_sec > 0:
        demand = args.chip_steps_per_sec * args.batch_size
        out["chip_demand_images_per_sec"] = round(demand, 1)
        out["loader_vs_demand"] = round(rate / demand, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
