#!/usr/bin/env bash
# Round-4 serialized TPU run queue (this box has ONE core — never two heavy
# jobs at once; CLAUDE.md). Stages in VERDICT-r3 priority order; each stage
# gates on its own artifacts so a mid-queue death leaves resumable state.
#
#   1. Rescore the committed family on the capacity-graded proxy60-v3
#      (VERDICT item 1 — the monotone accuracy-latency Pareto).
#   2. Per-stage eval MFU profile (item 8; short chip job).
#   3. Reference-recipe search: 90 epochs / 10 warmup / T_decay 0.96 /
#      lambda 0.1 on proxy60-v3, full parse->retrain->test (item 3).
#   4. Lambda sweep on proxy30 at target 0.35 (item 4).
#   5. Natural hybrid determination, no alpha seeding (item 5).
#
# Usage: bash tools_round4_queue.sh [start-stage]   (default 1)
set -u
START=${1:-1}

log () { echo "=== [queue $(date -u +%H:%M:%S)] $*"; }

if [ "$START" -le 1 ]; then
  log "stage 1: family rescore on proxy60-v3"
  ROOT=/root/data/proxy60 NUM_CLASSES=60 TAG=v3 \
    bash tools_rescore_family.sh > /tmp/q1_rescore.log 2>&1
  log "stage 1 done (log /tmp/q1_rescore.log)"
fi

if [ "$START" -le 2 ]; then
  log "stage 2: per-stage eval profile (family-a config, bs 256)"
  CFG=$(ls checkpoints_e2e/proxy30-e2e-family-a/search-*/model.config | head -1)
  python tools_profile_eval.py --config_path "$CFG" \
    > /tmp/q2_profile_eval.log 2>&1
  log "stage 2 done (log /tmp/q2_profile_eval.log)"
fi

if [ "$START" -le 3 ]; then
  log "stage 3: reference-recipe 90-epoch search on proxy60-v3"
  ROOT=/root/data/proxy60 NUM_CLASSES=60 NOTE_PREFIX=proxy60-ref-recipe \
    EPOCHS=90 WARMUP=10 T0=5.0 TDECAY=0.96 LAMBDA=0.1 TARGET=0.25 \
    SCAN=4 EVAL_EPOCHS=24 \
    bash tools_e2e_proxy.sh > /tmp/q3_refrecipe.log 2>&1
  log "stage 3 done (log /tmp/q3_refrecipe.log)"
fi

if [ "$START" -le 4 ]; then
  log "stage 4: lambda sweep (l0.1, l2.0) at target 0.35 on proxy30"
  SPECS="l0.1:0.1:1.0 l2.0:2.0:1.0" EPOCHS=20 WARMUP=8 SCAN=4 \
    bash tools_lambda_sweep.sh > /tmp/q4_lsweep.log 2>&1
  log "stage 4 done (log /tmp/q4_lsweep.log)"
fi

if [ "$START" -le 5 ]; then
  log "stage 5: natural hybrid determination (no seeding)"
  EPOCHS=26 WARMUP=8 TARGET=0.3 LAMBDA=0.5 SCAN=4 EVAL_EPOCHS=16 \
    bash tools_e2e_hybrid_natural.sh > /tmp/q5_hybrid.log 2>&1
  log "stage 5 done (log /tmp/q5_hybrid.log)"
fi

log "queue complete"
