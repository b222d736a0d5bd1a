#!/usr/bin/env bash
# Resume tools_e2e_proxy.sh from stage 4 (retrain) + 5 (test) against an
# already-completed search run dir. Used when the loop died between stages
# (each stage is artifact-gated, so this is just the tail of the loop).
#
# Usage: bash tools_e2e_resume45.sh RUN_DIR EVSAVE [epochs]
set -u
RUN_DIR=$1
EVSAVE=$2
EPOCHS=${3:-24}
ROOT=/root/data/proxy30
NUM_CLASSES=30
RRC=0.35
NOTE=$(basename "$RUN_DIR" | sed 's/^search-[0-9]*-[0-9]*-//')

echo "=== [4/5] retrain the parsed arch ($RUN_DIR/model.config)"
python tools_run_watchdog.py --save "$EVSAVE" --stall_sec 1200 \
  --wait_for_device --resume_flag=--snapshot \
  --ckpt_glob '*/checkpoint.pkl' -- \
  python -u train_eval.py \
    --train_root "$ROOT" --val_root "$ROOT" \
    --train_list "$ROOT/proxy_train.txt" --val_list "$ROOT/proxy_val.txt" \
    --config_path "$RUN_DIR/model.config" --save "$EVSAVE" \
    --epochs "$EPOCHS" --batch_size 64 --lr 0.05 --weight_decay 1e-5 \
    --label_smooth 0.1 --num_classes $NUM_CLASSES --image_size 224 \
    --dropout_rate 0.2 --drop_connect_rate 0.2 \
    --rrc_min_scale $RRC --workers 4 --note "$NOTE-retrain"

EVAL_DIR=$(ls -dt "$EVSAVE"/eval-*-"$NOTE-retrain" 2>/dev/null | head -1)
BEST="$EVAL_DIR/model_best.pkl"
if [ ! -f "$BEST" ]; then echo "no retrain best ckpt; abort"; exit 1; fi

echo "=== [5/5] test"
python -u test.py --val_root "$ROOT" --val_list "$ROOT/proxy_val.txt" \
  --config_path "$RUN_DIR/model.config" --weights "$BEST" \
  --batch_size 64 --num_classes $NUM_CLASSES | tee "$EVAL_DIR/test.txt"

echo "=== e2e stages 4-5 complete: $RUN_DIR -> $EVAL_DIR"
