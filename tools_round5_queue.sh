#!/usr/bin/env bash
# Round-5 post-queue measurements (VERDICT r4 items 6 and 7). Runs AFTER
# the round-4 queue (ref-recipe e2e -> lambda sweep -> natural hybrid)
# completes: both need the core/chip free — the occupancy sweep's 8
# paused windows would trip a supervised trainer's stall watchdog.
#
# Usage: bash tools_round5_queue.sh
set -u
cd /root/repo

log () { echo "=== [q5 $(date -u +%H:%M:%S)] $*"; }

log "stage A0: lambda-sweep boost probe (lambda=0.5 boost=4, target 0.35)"
# completes the item-3 question: q4 measures how far the reference's
# symmetric loss undershoots at lambda 0.1 and what symmetric lambda 2.0
# recovers; b4 applies the SAME under-target pull as symmetric 2.0
# (0.5x4) while keeping reference-parity weighting above target — the
# asymmetric fix, isolated.
SPECS="b4:0.5:4.0" EPOCHS=20 WARMUP=8 SCAN=4 \
  bash tools_lambda_sweep.sh > /tmp/q5a0_boost.log 2>&1
log "stage A0 done (log /tmp/q5a0_boost.log)"

log "stage A: single-chip search occupancy ablation (bs 32/64/128/256)"
python tools_occupancy_ab.py --json_out occupancy_ablation.json \
  > /tmp/q5a_occupancy.log 2>&1
log "stage A done (log /tmp/q5a_occupancy.log)"

log "stage B: full-space multichip search dryrun retry (CPU, virtual 8)"
# round-4 note: the full-space pareto search step fatally aborted the XLA
# CPU compiler on this single-core host; retry at reduced shapes and
# capture the outcome either way.
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  TFNAS_DRYRUN_SEARCH=full \
  timeout 2400 python -c \
    "import __graft_entry__ as g; g.dryrun_multichip(8)" \
  > /tmp/q5b_dryrun_full.log 2>&1
RC=$?
log "stage B done rc=$RC (log /tmp/q5b_dryrun_full.log)"

log "stage B2: hard-val scoring of the ref-recipe member (2 severities)"
RR_CFG=checkpoints_e2e/proxy60-ref-recipe/search-20260820-133107-proxy60-ref-recipe/model.config
RR_EVAL=$(ls -dt checkpoints_e2e/proxy60-ref-recipe-retrain/eval-* | head -1)
for SPEC in "/root/data/proxy60hard:hardtest.txt" \
            "/root/data/proxy60hard50:hardtest_c50.txt"; do
  HR=${SPEC%%:*}; OUT="$RR_EVAL/${SPEC##*:}"
  [ -f "$OUT" ] && continue
  if python -u test.py --val_root "$HR" --val_list "$HR/proxy_val.txt" \
      --config_path "$RR_CFG" --weights "$RR_EVAL/model_best.pkl" \
      --batch_size 64 --num_classes 60 | tee "$OUT.tmp" \
      && grep -q Val_acc_top1 "$OUT.tmp"; then
    mv "$OUT.tmp" "$OUT"
  fi
done
log "stage B2 done"

log "stage D: batch-size arch-parity pair on proxy60 (bs 32 vs bs 128)"
# item-6 fidelity half: does searching at the occupancy-filling batch
# change the searched architecture? Same seed/schedule/target, only
# batch and (linearly scaled) w_lr differ; compare the parsed archs.
for SPEC in "32:0.025" "128:0.1"; do
  BS=${SPEC%%:*}; WLR=${SPEC##*:}
  NOTE=bsparity-bs$BS
  SAVE=./checkpoints_e2e/bsparity/$NOTE
  RUN_DONE=$(ls -d "$SAVE"/search-*-"$NOTE"/model.config 2>/dev/null | head -1)
  [ -n "$RUN_DONE" ] && continue
  python tools_run_watchdog.py --save "$SAVE" --stall_sec 1200 \
    --wait_for_device -- \
    python -u train_search.py \
      --img_root /root/data/proxy60 \
      --train_list /root/data/proxy60/proxy_train.txt \
      --val_list /root/data/proxy60/proxy_val.txt \
      --lookup_path ./latency_pkl/latency_tpu_v5e_bs32.pkl --save "$SAVE" \
      --epochs 26 --warmup_epochs 8 --batch_size $BS --w_lr $WLR \
      --image_size 224 --num_classes 60 --seed 2 \
      --T 5.0 --T_decay 0.85 --lambda_lat 0.5 --target_lat 0.25 \
      --rrc_min_scale 0.35 --save_freq 8 --scan_units 4 --note "$NOTE" \
      > /tmp/q5d_bs$BS.log 2>&1
  RUN_DIR=$(ls -dt "$SAVE"/search-*-"$NOTE" 2>/dev/null | head -1)
  FINAL=$(ls -t "$RUN_DIR"/searched_model_*.pkl 2>/dev/null | head -1)
  [ -n "$FINAL" ] && python -u parsing_model.py --model_path "$FINAL" \
      --save_path "$RUN_DIR/model.config" \
      --lookup_path ./latency_pkl/latency_tpu_v5e_bs32.pkl \
      --num_classes 60 >> /tmp/q5d_bs$BS.log 2>&1
  rm -f "$RUN_DIR"/searched_model_*.pkl
done
log "stage D done (logs /tmp/q5d_bs*.log)"

log "stage C: full fast suite (uncontended core)"
python -m pytest tests/ -x -q > /tmp/q5c_pytest.log 2>&1
log "stage C done rc=$? (log /tmp/q5c_pytest.log)"

log "round-5 queue complete"
