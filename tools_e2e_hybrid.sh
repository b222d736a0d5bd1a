#!/usr/bin/env bash
# Hybrid-space e2e smoke on real JPEGs (VERDICT round-2 item 4).
#
# Short `--space hybrid` search on the 30-class compositional proxy, then
# the ViT round trip: boost the ViT candidate's alpha at its valid blocks
# (tools_seed_vit_alpha.py), parse -> model.config containing a ViTBlock
# entry, retrain a few epochs through train_eval.py, score with test.py.
# Mirrors tools_e2e_proxy.sh but sized as a smoke (~40 min TPU).
#
# Usage: bash tools_e2e_hybrid.sh [note-suffix]
set -u

ROOT=/root/data/proxy30
NUM_CLASSES=30
LUT=./latency_pkl/latency_tpu_v5e_bs32_hybrid.pkl
NOTE="hybrid-e2e${1:+-$1}"
SAVE=./checkpoints_e2e/$NOTE
EVSAVE=./checkpoints_e2e/$NOTE-retrain
EPOCHS=8
WARMUP=3
TARGET=0.25
RRC=0.35

echo "=== [1/6] hybrid search: $EPOCHS epochs, target_lat $TARGET"
python tools_run_watchdog.py --save "$SAVE" --stall_sec 1200 \
  --wait_for_device -- \
  python -u train_search.py \
    --space hybrid \
    --img_root "$ROOT" \
    --train_list "$ROOT/proxy_train.txt" --val_list "$ROOT/proxy_val.txt" \
    --lookup_path "$LUT" --save "$SAVE" \
    --epochs $EPOCHS --warmup_epochs $WARMUP --batch_size 32 \
    --image_size 224 --num_classes $NUM_CLASSES --seed 2 \
    --T 5.0 --T_decay 0.85 --lambda_lat 0.1 --target_lat $TARGET \
    --rrc_min_scale $RRC --save_freq 4 --note "$NOTE"

RUN_DIR=$(ls -dt "$SAVE"/search-*-"$NOTE" 2>/dev/null | head -1)
FINAL=$(ls -t "$RUN_DIR"/searched_model_*.pkl 2>/dev/null | head -1)
if [ -z "${FINAL:-}" ]; then echo "no search checkpoint; abort"; exit 1; fi
echo "=== hybrid run dir: $RUN_DIR; final ckpt: $FINAL"

echo "=== [2/6] seed the ViT candidate so parsing elects it"
VIT_CKPT="${FINAL%.pkl}_vit.pkl"
python tools_seed_vit_alpha.py --ckpt "$FINAL" --out "$VIT_CKPT" --boost 3.0

echo "=== [3/6] convergence report"
JAX_PLATFORMS=cpu python tools_search_report.py --run_dir "$RUN_DIR" \
  --lookup_path "$LUT" --space hybrid | tee "$RUN_DIR/report.txt" || true

echo "=== [4/6] parse -> model.config (must contain a ViTBlock entry)"
python -u parsing_model.py --space hybrid --model_path "$VIT_CKPT" \
  --save_path "$RUN_DIR/model.config" --lookup_path "$LUT" \
  --num_classes $NUM_CLASSES
grep -q ViTBlock "$RUN_DIR/model.config" \
  && echo "model.config contains a ViTBlock" \
  || { echo "no ViTBlock in parsed config; abort"; exit 1; }

echo "=== [5/6] retrain the parsed hybrid arch"
python tools_run_watchdog.py --save "$EVSAVE" --stall_sec 1200 \
  --wait_for_device --resume_flag=--snapshot \
  --ckpt_glob '*/checkpoint.pkl' -- \
  python -u train_eval.py \
    --train_root "$ROOT" --val_root "$ROOT" \
    --train_list "$ROOT/proxy_train.txt" --val_list "$ROOT/proxy_val.txt" \
    --config_path "$RUN_DIR/model.config" --save "$EVSAVE" \
    --epochs 6 --batch_size 64 --lr 0.05 --weight_decay 1e-5 \
    --label_smooth 0.1 --num_classes $NUM_CLASSES --image_size 224 \
    --dropout_rate 0.2 --drop_connect_rate 0.2 \
    --rrc_min_scale $RRC --workers 4 --note "$NOTE-retrain"

EVAL_DIR=$(ls -dt "$EVSAVE"/eval-*-"$NOTE-retrain" 2>/dev/null | head -1)
BEST="$EVAL_DIR/model_best.pkl"
if [ ! -f "$BEST" ]; then echo "no retrain best ckpt; abort"; exit 1; fi

echo "=== [6/6] test"
python -u test.py --val_root "$ROOT" --val_list "$ROOT/proxy_val.txt" \
  --config_path "$RUN_DIR/model.config" --weights "$BEST" \
  --batch_size 64 --num_classes $NUM_CLASSES | tee "$EVAL_DIR/test.txt"

echo "=== hybrid e2e smoke complete: $RUN_DIR -> $EVAL_DIR"
