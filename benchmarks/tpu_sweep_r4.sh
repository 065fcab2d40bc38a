#!/bin/bash
# Round-4 on-chip measurement queue. Unlike round 3's sweep, this one CANNOT
# skip items silently: every item is registered, and the exit summary prints
# a PASS/FAIL/MISSING table (VERDICT r3 #2 — "queue drained" means ls
# results_r4 matches this list).
#   nohup bash benchmarks/tpu_sweep_r4.sh > /tmp/tpu_sweep_r4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="${PYTHONPATH:-}:/root/repo"
OUT=${OUT:-/root/repo/benchmarks/results_r4}
mkdir -p "$OUT"

ITEMS=()
run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  ITEMS+=("$name")
  # Only SUCCESSFUL items are cached: a failed item reruns on the next
  # invocation (after the fix), instead of being skipped as "done".
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

# 1. CORRECTNESS GATES first (a red gate means nothing below is shippable)
run verify_hier 3600 python benchmarks/verify_hier_onchip.py
run gate_full 7200 python benchmarks/compile_gate.py

# 1b. grouped-tile lane widening on HIER (VERDICT r3 #4: fwd <= 151 ms
# minimum, <= 60 ms target at config 2) — A/B vs the round-3 baseline
# (183 ms device fwd, 520 ms bwd)
P2="--width 800 --height 800 --gaussians 100000"
run prof_hier_fwd 2400 python benchmarks/profile_step.py $P2 --mode HIER --fwd-only --top 12
run prof_hier_g2_fwd 2400 env STP_HIER_GROUP=2 python benchmarks/profile_step.py $P2 --mode HIER --fwd-only --top 12
# (G=4 fwd removed: 64/8/4 at G=4 overflows the 16 MB Mosaic scoped-vmem
# stack — results_r4/prof_hier_g4_fwd.log — and the knob is now clamped to 2)
run prof_hier_g2 3600 env STP_HIER_GROUP=2 STP_HIER_GROUP_BWD=2 python benchmarks/profile_step.py $P2 --mode HIER --top 12
run prof_hier_g4 3600 env STP_HIER_GROUP=4 STP_HIER_GROUP_BWD=4 python benchmarks/profile_step.py $P2 --mode HIER --top 12
# mixed: grouped forward + ungrouped backward (grouping is value-exact, so
# the VJP may mix; the backward's moment routing measured slower grouped)
# (the mixed grouped-fwd/per-tile-bwd profile moved to wave 2 as
# prof_hier_b — it is now simply the default configuration)

# 2. the two stale decision points (VERDICT r3 #2)
run quality_defaults 5400 python benchmarks/quality_defaults.py
P2="--width 800 --height 800 --gaussians 100000"
run prof_kbuf_g2_fwd 1800 env STP_KB_GROUP=2 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --fwd-only --top 12
run prof_kbuf_g4_fwd 1800 env STP_KB_GROUP=4 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --fwd-only --top 12
run prof_kbuf_g8_fwd 1800 env STP_KB_GROUP=8 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --fwd-only --top 12
run prof_kbuf_g2 2400 env STP_KB_GROUP=2 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --top 12
run prof_kbuf_g4 2400 env STP_KB_GROUP=4 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --top 12

# 3. the overlap-scene quality ladder (VERDICT r3 #3, three rounds due)
run quality_overlap 7200 python benchmarks/quality.py --scene overlap

# 4. headline with the new repetition statistics (pre-defaults baseline);
# run twice back-to-back: VERDICT r3 #5 wants two consecutive runs within 5%
run bench 2400 python bench.py
run bench2 2400 python bench.py

# 5. evidence hygiene: regenerate the stale round-3 profiles with the
# fixed profiler (VERDICT r3 #6)
run prof_global 1200 python benchmarks/profile_step.py --top 20
run prof_rankkey 1200 python benchmarks/profile_step.py --rank-key --top 20

# 6. config-3 scale cost structure (VERDICT r3 #7: 5M @ 1080p fwd+bwd
# >= 5 Mpix/s): where do the 877 ms actually go?
P5="--width 1920 --height 1080 --gaussians 5000000 --scale-shift -3.3 --iters 3"
run prof_global_5m_fwd 3600 python benchmarks/profile_step.py $P5 --fwd-only --top 25
run prof_global_5m 3600 python benchmarks/profile_step.py $P5 --top 25

# ------------------------------------------------------------------
# Wave 2 (post routing-change commit 1f2f6e1): the split grouped backward
# and the single one-hot moment routing landed AFTER wave 1 measured the
# backwards, so re-verify + re-profile them, and re-run the 5M profile
# with the quality-gated winners folded in.

# correctness first: HIER on-chip verify + the all-modes execution gate
# must PASS with the new routing
run verify_hier2 3600 python benchmarks/verify_hier_onchip.py
run exec_gate 7200 python benchmarks/execution_gate.py

# fwd+bwd at the new defaults (G=2 fwd, per-tile bwd, new routing)
run prof_hier_b 3600 python benchmarks/profile_step.py $P2 --mode HIER --top 12
run prof_kbuf_b 2400 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --top 12

# config-2 combo cost structure: where do the headline's 82 ms/iter go?
run prof_combo 1800 python benchmarks/profile_step.py --tile 32x16 --carry-bf16 --rank-key --top 20

# config-3 with the winners (tile32 + bf16): the wave-1 5M profile ran the
# reference-parity config only
run prof_global_5m_opt_fwd 3600 python benchmarks/profile_step.py $P5 --tile 32x16 --carry-bf16 --fwd-only --top 25
run prof_global_5m_opt 3600 python benchmarks/profile_step.py $P5 --tile 32x16 --carry-bf16 --top 25

echo "SWEEP COMPLETE $(date)"
