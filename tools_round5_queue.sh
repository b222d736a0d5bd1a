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

log "stage C: full fast suite (uncontended core)"
python -m pytest tests/ -x -q > /tmp/q5c_pytest.log 2>&1
log "stage C done rc=$? (log /tmp/q5c_pytest.log)"

log "round-5 queue complete"
