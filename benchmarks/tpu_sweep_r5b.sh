#!/bin/bash
# Round-5 wave 2: quality gates for the round's candidates, the 5M attack,
# the on-chip temporal (popping) evidence, and the final headline.
# Run AFTER tpu_sweep_r5.sh (wave 0+1) drains:
#   nohup bash benchmarks/tpu_sweep_r5b.sh > /tmp/tpu_sweep_r5b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="${PYTHONPATH:-}:/root/repo"
OUT=${OUT:-/root/repo/benchmarks/results_r5}
mkdir -p "$OUT"

ITEMS=()
run() {
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
    if [ ! -s "$OUT/$name.log" ]; then echo "MISSING  $name"; bad=1
    elif grep -q "^DONE rc=0" "$OUT/$name.log"; then echo "ok       $name"
    else echo "FAILED   $name"; bad=1; fi
  done
  [ $bad -eq 0 ] && echo "QUEUE DRAINED: all items ok" \
                 || echo "QUEUE NOT CLEAN: see FAILED/MISSING above"
}
trap summary EXIT

timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down, abort"; exit 1; }

P5="--width 1920 --height 1080 --gaussians 5000000 --scale-shift -3.3 --iters 3"

P2="--width 800 --height 800 --gaussians 100000"

# 0. HIER on-chip verify at the final routing default ("split": exact
#    bf16-split routing; plain DEFAULT FAILED the 5e-3 gradient gate at
#    rel 3.4e-2, results_r5/verify_hier_def) + the split perf cells
run verify_hier_final 3600 python benchmarks/verify_hier_onchip.py
run prof_kbuf_b_split 2400 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --top 8
run prof_hier_b_split 3600 python benchmarks/profile_step.py $P2 --mode HIER --top 8

# 1. fit gate incl. the pack_fwd arms (primary quality evidence for the
#    f16-packed forward payload)
run quality_defaults2 7200 python benchmarks/quality_defaults.py

# 2. config 3 (5M @ 1080p): winners + pack_fwd, with the HLO dump so the
#    dominant fusions are finally named (VERDICT r4 next #3)
run prof_global_5m_pf_fwd 3600 python benchmarks/profile_step.py $P5 --tile 32x16 --carry-bf16 --rank-key --pack-fwd --fwd-only --top 25
run prof_global_5m_pf 4800 python benchmarks/profile_step.py $P5 --tile 32x16 --carry-bf16 --rank-key --pack-fwd --top 25 --dump-hlo "$OUT/hlo_5m_pf.txt"

# 3. config 4 (headline scene) combo with pack_fwd
run prof_combo_pf 1800 python benchmarks/profile_step.py --tile 32x16 --carry-bf16 --rank-key --pack-fwd --top 20

# 4. temporal evidence on chip (VERDICT r4 next #4): popping ladder on the
#    overlap scene + the intermediate-depth regime
run popping_overlap 14400 python benchmarks/popping.py --scene overlap
run quality_overlap_mild 10800 python benchmarks/quality.py --scene overlap-mild

# 5. all-modes execution gate at the new defaults
run exec_gate 10800 python benchmarks/execution_gate.py

# 6. final headline, twice back-to-back; pack_fwd folded in only if its
#    fit gate passed
PACKFWD=0
if grep -q '"gate_packfwd": "PASS"' "$OUT/quality_defaults2.log" 2>/dev/null; then
  PACKFWD=1
fi
run bench_final 2400 env STP_BENCH_PACKFWD=$PACKFWD python bench.py
run bench_final2 2400 env STP_BENCH_PACKFWD=$PACKFWD python bench.py

echo "WAVE 2 COMPLETE $(date)"
