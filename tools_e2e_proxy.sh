#!/usr/bin/env bash
# Full search -> report -> parse -> retrain -> test loop on the real-JPEG
# proxy dataset (the reference's example.sh workflow, executed end-to-end
# on the attached TPU; reference example.sh:1-134).
#
# Stage gating: each stage only starts if the previous one produced its
# artifact, so a relay death mid-run leaves a resumable state (the search
# stage is already watchdog-supervised + --resume-able).
#
# Usage: bash tools_e2e_proxy.sh [note-suffix]
set -u

# 30-class compositional proxy (3 fine x 10 coarse). The 100-class v2 run
# sat at exact chance through 4 warmup epochs: tools_proxy_learnability.py
# showed the task+pipeline learn fine but need ~40k samples for traction at
# probe scale — beyond what a weight-sharing supernet gets in a short
# warmup at 100 classes. 30 classes keeps the compositional binding (depth
# pressure) with ~3x faster traction; warmup is doubled for the same reason.
ROOT=${ROOT:-/root/data/proxy30}
NUM_CLASSES=${NUM_CLASSES:-30}
LUT=./latency_pkl/latency_tpu_v5e_bs32.pkl
NOTE="${NOTE_PREFIX:-proxy30-e2e}${1:+-$1}"
# per-stage save roots: the watchdog resumes from the newest checkpoint
# under its --save, so sharing a root with older runs would cross-resume
SAVE=./checkpoints_e2e/$NOTE
EVSAVE=./checkpoints_e2e/$NOTE-retrain
# env-overridable knobs (e.g. the depth-pressure run uses TARGET=0.28
# LAMBDA=0.5 so the symmetric |lat/target-1| loss binds from below and
# pulls beta toward deeper stages instead of letting CE collapse it)
EPOCHS=${EPOCHS:-26}
WARMUP=${WARMUP:-8}
TARGET=${TARGET:-0.2}
LAMBDA=${LAMBDA:-0.1}
RRC=${RRC:-0.35}
SCAN=${SCAN:-1}   # --scan_units: K>1 runs the one-jitted-scan macro-iteration
T0=${T0:-5.0}
TDECAY=${TDECAY:-0.85}   # reference schedule: 0.96 over 90 epochs
BOOST=${BOOST:-1.0}
EVAL_EPOCHS=${EVAL_EPOCHS:-24}

echo "=== [1/5] search: $EPOCHS epochs, target_lat $TARGET, rrc_min $RRC"
python tools_run_watchdog.py --save "$SAVE" --stall_sec 1200 \
  --wait_for_device -- \
  python -u train_search.py \
    --img_root "$ROOT" \
    --train_list "$ROOT/proxy_train.txt" --val_list "$ROOT/proxy_val.txt" \
    --lookup_path "$LUT" --save "$SAVE" \
    --epochs $EPOCHS --warmup_epochs $WARMUP --batch_size 32 \
    --image_size 224 --num_classes $NUM_CLASSES --seed 2 \
    --T $T0 --T_decay $TDECAY --lambda_lat $LAMBDA --target_lat $TARGET \
    --lat_under_boost $BOOST \
    --rrc_min_scale $RRC --save_freq 4 --scan_units $SCAN --note "$NOTE"

RUN_DIR=$(ls -dt "$SAVE"/search-*-"$NOTE" 2>/dev/null | head -1)
FINAL=$(ls -t "$RUN_DIR"/searched_model_*.pkl 2>/dev/null | head -1)
if [ -z "${FINAL:-}" ]; then echo "no search checkpoint; abort"; exit 1; fi
echo "=== search run dir: $RUN_DIR; final ckpt: $FINAL"

echo "=== [2/5] convergence report"
JAX_PLATFORMS=cpu python tools_search_report.py --run_dir "$RUN_DIR" \
  --lookup_path "$LUT" | tee "$RUN_DIR/report.txt"

echo "=== [3/5] parse -> model.config"
python -u parsing_model.py --model_path "$FINAL" \
  --save_path "$RUN_DIR/model.config" --lookup_path "$LUT" \
  --num_classes $NUM_CLASSES

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

echo "=== e2e loop complete: $RUN_DIR -> $EVAL_DIR"
