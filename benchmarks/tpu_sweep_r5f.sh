#!/bin/bash
# Round-5 wave 5: the row-scatter probe (decides the direct-scatter VJP
# design), a fresh compile gate over the changed dispatch (split routing,
# grouped-bwd defaults, value-packed transport), and the refreshed micro
# table. Run AFTER tpu_sweep_r5d.sh drains:
#   nohup bash benchmarks/tpu_sweep_r5f.sh > /tmp/tpu_sweep_r5e.log 2>&1 &
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

# depth-column elision A/B (nothing reads the Depth accumulator in the
# train step, so the pair gather narrows 10 -> 9 columns)
run prof_global_5m_cd 4800 python benchmarks/profile_step.py $P5 --tile 32x16 --carry-bf16 --rank-key --top 12
run bench_cd 2400 python bench.py
run bench_cd2 2400 python bench.py

echo "WAVE 6 COMPLETE $(date)"
