#!/usr/bin/env bash
# Soft-equilibrium ceiling sweep (VERDICT r3 item 4): short searches at a
# fixed high target with varying lambda_lat (and one asymmetric
# --lat_under_boost probe), each parsed to its final LUT latency.
#
# Round-3 anchors at TARGET=0.35 on proxy30 (26-epoch production runs):
#   lambda=0.5 -> expected lat saturates ~0.25, parsed 0.2551 (family-c)
#   lambda=1.0 -> parsed 0.3138 (family-a)
# This sweep adds lambda=0.1 / 2.0 and boost=4 at 20 epochs; the result
# table (target x lambda -> parsed latency) goes in docs/E2E_PROXY30.md.
#
# Usage: bash tools_lambda_sweep.sh  (env: TARGET EPOCHS WARMUP SCAN)
set -u

ROOT=/root/data/proxy30
NUM_CLASSES=30
LUT=./latency_pkl/latency_tpu_v5e_bs32.pkl
TARGET=${TARGET:-0.35}
EPOCHS=${EPOCHS:-20}
WARMUP=${WARMUP:-8}
SCAN=${SCAN:-4}

run_one () {  # $1=tag $2=lambda $3=under_boost
  local NOTE="lsweep-$1"
  local SAVE=./checkpoints_e2e/lambda-sweep/$NOTE
  echo "=== lsweep $1: lambda=$2 boost=$3 target=$TARGET ($EPOCHS epochs)"
  python tools_run_watchdog.py --save "$SAVE" --stall_sec 1200 \
    --wait_for_device -- \
    python -u train_search.py \
      --img_root "$ROOT" \
      --train_list "$ROOT/proxy_train.txt" --val_list "$ROOT/proxy_val.txt" \
      --lookup_path "$LUT" --save "$SAVE" \
      --epochs $EPOCHS --warmup_epochs $WARMUP --batch_size 32 \
      --image_size 224 --num_classes $NUM_CLASSES --seed 2 \
      --T 5.0 --T_decay 0.85 --lambda_lat $2 --target_lat $TARGET \
      --lat_under_boost $3 \
      --rrc_min_scale 0.35 --save_freq 8 --scan_units $SCAN --note "$NOTE"
  local RUN_DIR=$(ls -dt "$SAVE"/search-*-"$NOTE" 2>/dev/null | head -1)
  local FINAL=$(ls -t "$RUN_DIR"/searched_model_*.pkl 2>/dev/null | head -1)
  if [ -z "${FINAL:-}" ]; then echo "lsweep $1: no ckpt"; return 1; fi
  python -u parsing_model.py --model_path "$FINAL" \
    --save_path "$RUN_DIR/model.config" --lookup_path "$LUT" \
    --num_classes $NUM_CLASSES
  # keep history lean: the arch dumps + config are the evidence
  rm -f "$RUN_DIR"/searched_model_*.pkl
}

SPECS=${SPECS:-"l0.1:0.1:1.0 l2.0:2.0:1.0 b4:0.5:4.0"}
for SPEC in $SPECS; do
  IFS=: read TAG LAM BOOST <<< "$SPEC"
  run_one "$TAG" "$LAM" "$BOOST"
done
echo "=== lambda sweep done"
