#!/usr/bin/env python
"""Single-chip occupancy ablation for the search step (VERDICT r4 item 6).

The reference recipe's bs-32/224^2 bi-level step is ~4%% of bf16 peak on a
v5e (README MFU table): the program is occupancy-bound, not FLOPs-bound.
This measures how far one chip can be filled by scaling the search batch,
holding everything else fixed: steps/s and images/s at bs 32/64/128/256.

Discipline (CLAUDE.md): all measurements in ONE process; TWO rounds over
the batch sizes so round 2 is warm for every variant (round 1 pays each
program's compile); only round-2 numbers are reported; bench.py's
paused-trainers window wraps each timed pass (compile+warmup inside).

Output: one JSON line per batch size + a summary table on stderr.

Run this with NO watchdogged trainer in flight: 8 back-to-back paused
windows (one per variant per round) leave a supervised trainer's log
stale for the whole sweep, which trips the watchdog's stall restart.
"""

import argparse
import json
import sys

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="32,64,128,256")
    ap.add_argument("--n_timed", type=int, default=24)
    ap.add_argument("--warm", type=int, default=6)
    ap.add_argument("--json_out", type=str, default="")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    results = {}
    for rnd in (1, 2):
        for bs in batches:
            rate = bench.bench_search_steps_per_sec(
                batch=bs, n_timed=args.n_timed, warm=args.warm,
                lut_path="latency_pkl/latency_tpu_v5e_bs32.pkl")
            print(f"# round {rnd} bs {bs}: {rate:.3f} steps/s "
                  f"({rate * bs:.0f} img/s)", file=sys.stderr, flush=True)
            if rnd == 2:  # warm pass only
                results[bs] = rate

    rows = []
    base = results[batches[0]] * batches[0]
    for bs in batches:
        r = results[bs]
        rows.append({"batch": bs, "steps_per_sec": round(r, 3),
                     "images_per_sec": round(r * bs, 1),
                     "throughput_vs_bs32": round(r * bs / base, 2)})
    out = json.dumps({"metric": "search_occupancy_ablation", "rows": rows})
    print(out)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(out + "\n")
    print("batch  steps/s  img/s   x-vs-bs32", file=sys.stderr)
    for row in rows:
        print(f"{row['batch']:>5}  {row['steps_per_sec']:>7.3f}  "
              f"{row['images_per_sec']:>6.0f}  {row['throughput_vs_bs32']:>5.2f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
