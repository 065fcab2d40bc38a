#!/bin/bash
# Round-5 on-chip measurement queue. Same discipline as round 4 (items
# register; exit trap prints PASS/FAIL/MISSING; DONE rc=0 items are cached)
# plus the round-4 lesson folded in (VERDICT r4 weak #5): the former
# "manual follow-ups" are sweep items — nothing lives outside the table.
#   nohup bash benchmarks/tpu_sweep_r5.sh > /tmp/tpu_sweep_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="${PYTHONPATH:-}:/root/repo"
OUT=${OUT:-/root/repo/benchmarks/results_r5}
mkdir -p "$OUT"

ITEMS=()
run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  ITEMS+=("$name")
  if [ -s "$OUT/$name.log" ] && grep -q "^DONE rc=0" "$OUT/$name.log"; then
    echo "== $name: cached, skip"; return
  fi
  echo "== $name: start $(date +%H:%M:%S)"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "DONE rc=$rc" >> "$OUT/$name.log"
  echo "== $name: rc=$rc $(date +%H:%M:%S)"
}

summary() {
  echo; echo "== QUEUE SUMMARY ($(date)) =="
  local bad=0
  for name in "${ITEMS[@]}"; do
    if [ ! -s "$OUT/$name.log" ]; then
      echo "MISSING  $name"; bad=1
    elif grep -q "^DONE rc=0" "$OUT/$name.log"; then
      echo "ok       $name"
    else
      echo "FAILED   $name  ($(grep '^DONE rc=' "$OUT/$name.log" | tail -1))"
      bad=1
    fi
  done
  [ $bad -eq 0 ] && echo "QUEUE DRAINED: all items ok" \
                 || echo "QUEUE NOT CLEAN: see FAILED/MISSING above"
}
trap summary EXIT

# 0. probe (fail fast if the tunnel is down)
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down, abort"; exit 1; }

P2="--width 800 --height 800 --gaussians 100000"
P5="--width 1920 --height 1080 --gaussians 5000000 --scale-shift -3.3 --iters 3"

# ---------------- WAVE 0: same-session anchors + decision probes --------
# Round-4 weak #1: perf changes without a same-session baseline are
# unattributable. These anchors are measured BEFORE any round-5 kernel
# change so every later A/B has its like-for-like partner in this session.

# the sort_micro gather width-scaling probe (decides the packed-payload
# attack on config 3 — VERDICT r4 next #3; built in 5b43985, never ran)
run sort_micro 2400 python benchmarks/sort_micro.py

# same-session backward baselines at the current defaults
run prof_kbuf_b_base 2400 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --top 12
run prof_hier_b_base 3600 python benchmarks/profile_step.py $P2 --mode HIER --top 12

# session headline anchor (drift reference for end-of-round bench)
run bench_base 2400 python bench.py

echo "WAVE 0 COMPLETE $(date)"

# ---------------- WAVE 1: backward routing precision + its consequences ---
# The replay's per-pop one-hot routing dots ran at HIGHEST (6-pass f32 MXU
# emulation); DEFAULT is 1-pass bf16 (the one-hot operand is exact at any
# precision — only the routed moment addends round). A/B all three against
# the wave-0 base (kbuf 164.5 / hier ~633 ms at HIGHEST, same session).

# correctness first: HIER on-chip verify at the new DEFAULT routing
run verify_hier_def 3600 python benchmarks/verify_hier_onchip.py

# precision ladder (backward replay, per-tile bwd, G=2 fwd)
run prof_kbuf_b_def 2400 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --top 8
run prof_hier_b_def 3600 python benchmarks/profile_step.py $P2 --mode HIER --top 8
# (HIGH cells removed: Mosaic rejects Precision.HIGH — 'Unsupported dot
# precision: HIGH', results_r5/prof_{kbuf,hier}_b_high.log — the finding
# that motivated the exact bf16-split mode, which dominates it anyway.)
run prof_kbuf_b_hst 2400 env STP_ROUTE_PRECISION=highest python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --top 8
run prof_hier_b_hst 3600 env STP_ROUTE_PRECISION=highest python benchmarks/profile_step.py $P2 --mode HIER --top 8

# grouped backward re-A/B: the r4 regression was attributed to routing cost
# scaling with lane width — with cheap dots the balance may flip
run prof_kbuf_b_def_g2 2400 env STP_KB_GROUP_BWD=2 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --top 8
run prof_hier_b_def_g2 3600 env STP_HIER_GROUP_BWD=2 python benchmarks/profile_step.py $P2 --mode HIER --top 8

# the 32x16 binning stream reaching the resort modes (VERDICT r4 next #2)
run prof_kbuf_b_t32 2400 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --tile 32x16 --top 8
run prof_hier_b_t32 3600 python benchmarks/profile_step.py $P2 --mode HIER --tile 32x16 --top 8

echo "WAVE 1 COMPLETE $(date)"
