#!/usr/bin/env bash
# Score the v3-rescored family on the HARD val render (VERDICT r3 item 1,
# round-4 follow-up): the capacity-graded proxy60-v3 still saturates at
# converged training (the smallest member reaches ~99% clean val top-1),
# so converged CLEAN accuracy cannot rank the family. This scores every
# member's converged rescore checkpoint on the corrupt=1.0 re-render of
# the SAME 1500 val scenes (dataset/make_proxy_dataset.py --corrupt:
# geometry draws identical, nuisance draws widened) — an ImageNet-C-style
# covariate shift where accuracy headroom, i.e. capacity, decides.
#
# Idempotent: skips members whose hardtest.txt already exists; regenerates
# the hard render if missing. Reuses the pinned dataset/proxy60_val.txt
# (same relpaths + labels — the hard render IS the same split).
#
# Usage: bash tools_hardval_family.sh [member ...]
set -u

HARDROOT=${HARDROOT:-/root/data/proxy60hard}
CORRUPT=${CORRUPT:-1.0}
TAG=${TAG:-v3}
BS=${BS:-64}
OUT_NAME=${OUT_NAME:-hardtest.txt}   # e.g. hardtest_c50.txt for CORRUPT=0.5

MEMBERS=${@:-proxy30-e2e-family-e proxy30-e2e proxy30-e2e-depth proxy30-e2e-family-c proxy30-e2e-family-a}

if [ ! -f "$HARDROOT/proxy_val.txt" ]; then
  echo "=== rendering hard val set (corrupt=$CORRUPT) -> $HARDROOT"
  python dataset/make_proxy_dataset.py --out_root "$HARDROOT" \
    --num_classes 60 --train_per_class 150 --val_per_class 25 \
    --version 3 --seed 7 --corrupt "$CORRUPT" --val_only
fi

for M in $MEMBERS; do
  RUN_DIR=$(ls -dt ./checkpoints_e2e/$M/search-*/ 2>/dev/null | head -1)
  CFG="$RUN_DIR/model.config"
  EVAL_DIR=$(ls -dt ./checkpoints_e2e/$M-rescore-$TAG/eval-* 2>/dev/null | head -1)
  BEST="$EVAL_DIR/model_best.pkl"
  OUT="$EVAL_DIR/$OUT_NAME"
  if [ ! -f "$CFG" ] || [ ! -f "$BEST" ]; then
    echo "=== $M: missing config or rescore best ckpt, skip"; continue
  fi
  if [ -f "$OUT" ]; then echo "=== $M: hardtest.txt exists, skip"; continue; fi
  echo "=== hard-val $M: $BEST on $HARDROOT"
  # write to .tmp and mv only on success: a crashed scorer must not leave
  # a done-marker that the idempotency check above would honor forever
  if python -u test.py --val_root "$HARDROOT" \
      --val_list "$HARDROOT/proxy_val.txt" \
      --config_path "$CFG" --weights "$BEST" \
      --batch_size $BS --num_classes 60 | tee "$OUT.tmp" \
      && grep -q Val_acc_top1 "$OUT.tmp"; then
    mv "$OUT.tmp" "$OUT"
  else
    echo "=== $M: scoring FAILED (kept $OUT.tmp for inspection)"
  fi
done
echo "=== hard-val scoring done"
