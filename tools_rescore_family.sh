#!/usr/bin/env bash
# Rescore the searched family on a (harder) proxy dataset: retrain + test
# every committed family model.config on the given dataset root, WITHOUT
# rerunning the searches (the arch is the artifact; accuracy is the score).
#
# Round-4 motivation (VERDICT r3 item 1): on proxy30 every member retrains
# to ~100% top-1, so the family table carries no accuracy-vs-latency
# trade-off. Rescoring on the capacity-graded v3 task
# (dataset/make_proxy_dataset.py --version 3) is the cheap way to the
# reference zoo's monotone top-1 column (/root/reference/README.md:20-25).
#
# Usage: ROOT=/root/data/proxy60 NUM_CLASSES=60 bash tools_rescore_family.sh \
#            [member ...]
# Members default to the full committed conv family (smallest -> largest).
set -u

ROOT=${ROOT:-/root/data/proxy60}
NUM_CLASSES=${NUM_CLASSES:-60}
EPOCHS=${EPOCHS:-24}
TAG=${TAG:-v3}
RRC=${RRC:-0.35}
BS=${BS:-64}

MEMBERS=${@:-proxy30-e2e-family-e proxy30-e2e proxy30-e2e-depth proxy30-e2e-family-c proxy30-e2e-family-a}

for M in $MEMBERS; do
  RUN_DIR=$(ls -dt ./checkpoints_e2e/$M/search-*/ 2>/dev/null | head -1)
  CFG="$RUN_DIR/model.config"
  if [ ! -f "$CFG" ]; then echo "=== $M: no model.config, skip"; continue; fi
  NOTE="$M-rescore-$TAG"
  EVSAVE=./checkpoints_e2e/$NOTE
  echo "=== rescore $M: retrain $CFG on $ROOT ($NUM_CLASSES classes, $EPOCHS epochs)"
  python tools_run_watchdog.py --save "$EVSAVE" --stall_sec 1200 \
    --wait_for_device --resume_flag=--snapshot \
    --ckpt_glob '*/checkpoint.pkl' -- \
    python -u train_eval.py \
      --train_root "$ROOT" --val_root "$ROOT" \
      --train_list "$ROOT/proxy_train.txt" --val_list "$ROOT/proxy_val.txt" \
      --config_path "$CFG" --save "$EVSAVE" \
      --epochs $EPOCHS --batch_size $BS --lr 0.05 --weight_decay 1e-5 \
      --label_smooth 0.1 --num_classes $NUM_CLASSES --image_size 224 \
      --dropout_rate 0.2 --drop_connect_rate 0.2 \
      --rrc_min_scale $RRC --workers 4 --note "$NOTE"
  EVAL_DIR=$(ls -dt "$EVSAVE"/eval-*-"$NOTE" 2>/dev/null | head -1)
  BEST="$EVAL_DIR/model_best.pkl"
  if [ ! -f "$BEST" ]; then echo "=== $M: no retrain best ckpt, skip test"; continue; fi
  python -u test.py --val_root "$ROOT" --val_list "$ROOT/proxy_val.txt" \
    --config_path "$CFG" --weights "$BEST" \
    --batch_size $BS --num_classes $NUM_CLASSES | tee "$EVAL_DIR/test.txt"
  echo "=== rescore $M done -> $EVAL_DIR"
done
