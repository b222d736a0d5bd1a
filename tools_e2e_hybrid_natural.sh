#!/usr/bin/env bash
# NATURAL hybrid-space determination (VERDICT r3 item 5): a full-length
# `--space hybrid` search with NO alpha seeding — where does ViT
# probability mass land when the search, not a tool, decides?
#
# Differs from tools_e2e_hybrid.sh (the 8-epoch smoke that seeded the ViT
# election to exercise the plumbing): full 26-epoch recipe, parse whatever
# wins, retrain + test it, and report the per-block ViT alpha trajectory.
# Either outcome is evidence: a natural ViT election upgrades the smoke to
# search evidence; conv-wins-everywhere is an honest stretch-goal closure.
#
# Usage: [ROOT=... NUM_CLASSES=... EPOCHS=... TARGET=...] \
#            bash tools_e2e_hybrid_natural.sh [note-suffix]
set -u

ROOT=${ROOT:-/root/data/proxy30}
NUM_CLASSES=${NUM_CLASSES:-30}
LUT=./latency_pkl/latency_tpu_v5e_bs32_hybrid.pkl
NOTE="${NOTE_PREFIX:-hybrid-natural}${1:+-$1}"
SAVE=./checkpoints_e2e/$NOTE
EVSAVE=./checkpoints_e2e/$NOTE-retrain
EPOCHS=${EPOCHS:-26}
WARMUP=${WARMUP:-8}
TARGET=${TARGET:-0.3}
LAMBDA=${LAMBDA:-0.5}
RRC=${RRC:-0.35}
SCAN=${SCAN:-4}
EVAL_EPOCHS=${EVAL_EPOCHS:-24}

echo "=== [1/5] natural hybrid search: $EPOCHS epochs, target_lat $TARGET"
python tools_run_watchdog.py --save "$SAVE" --stall_sec 1200 \
  --wait_for_device -- \
  python -u train_search.py \
    --space hybrid \
    --img_root "$ROOT" \
    --train_list "$ROOT/proxy_train.txt" --val_list "$ROOT/proxy_val.txt" \
    --lookup_path "$LUT" --save "$SAVE" \
    --epochs $EPOCHS --warmup_epochs $WARMUP --batch_size 32 \
    --image_size 224 --num_classes $NUM_CLASSES --seed 2 \
    --T 5.0 --T_decay 0.85 --lambda_lat $LAMBDA --target_lat $TARGET \
    --rrc_min_scale $RRC --save_freq 8 --scan_units $SCAN --note "$NOTE"

RUN_DIR=$(ls -dt "$SAVE"/search-*-"$NOTE" 2>/dev/null | head -1)
FINAL=$(ls -t "$RUN_DIR"/searched_model_*.pkl 2>/dev/null | head -1)
if [ -z "${FINAL:-}" ]; then echo "no search checkpoint; abort"; exit 1; fi
echo "=== natural hybrid run dir: $RUN_DIR; final ckpt: $FINAL"

echo "=== [2/5] convergence report (incl. per-block ViT alpha trajectory)"
JAX_PLATFORMS=cpu python tools_search_report.py --run_dir "$RUN_DIR" \
  --lookup_path "$LUT" --space hybrid | tee "$RUN_DIR/report.txt" || true

echo "=== [3/5] parse the NATURAL winner (no seeding) -> model.config"
python -u parsing_model.py --space hybrid --model_path "$FINAL" \
  --save_path "$RUN_DIR/model.config" --lookup_path "$LUT" \
  --num_classes $NUM_CLASSES
grep -q ViTBlock "$RUN_DIR/model.config" \
  && echo "NATURAL ViT election: model.config contains a ViTBlock" \
  || echo "natural winner is all-conv (no ViTBlock elected)"

echo "=== [4/5] retrain the parsed arch"
python tools_run_watchdog.py --save "$EVSAVE" --stall_sec 1200 \
  --wait_for_device --resume_flag=--snapshot \
  --ckpt_glob '*/checkpoint.pkl' -- \
  python -u train_eval.py \
    --train_root "$ROOT" --val_root "$ROOT" \
    --train_list "$ROOT/proxy_train.txt" --val_list "$ROOT/proxy_val.txt" \
    --config_path "$RUN_DIR/model.config" --save "$EVSAVE" \
    --epochs $EVAL_EPOCHS --batch_size 64 --lr 0.05 --weight_decay 1e-5 \
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

echo "=== natural hybrid e2e complete: $RUN_DIR -> $EVAL_DIR"
