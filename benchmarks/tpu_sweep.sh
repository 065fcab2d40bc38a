#!/bin/bash
# Unattended run of the on-chip measurement queue (benchmarks/TPU_QUEUE.md).
# Each item gets its own timeout and log under $OUT; failures don't stop the
# sweep. Intended to fire as soon as the axon tunnel returns:
#   nohup bash benchmarks/tpu_sweep.sh > /tmp/tpu_sweep.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="${PYTHONPATH:-}:/root/repo"
OUT=${OUT:-/root/repo/benchmarks/results_r3}
mkdir -p "$OUT"

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -s "$OUT/$name.log" ] && grep -q "DONE" "$OUT/$name.log"; then
    echo "== $name: cached, skip"; return
  fi
  echo "== $name: start $(date +%H:%M:%S)"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  [ $rc -eq 0 ] && echo "DONE rc=0" >> "$OUT/$name.log"
  echo "== $name: rc=$rc $(date +%H:%M:%S)"
}

# 0. probe (fail fast if the tunnel is down)
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down, abort"; exit 1; }

# 0b. HARDWARE COMPILE GATE — runs FIRST; a red gate means the kernels do
# not lower on the chip and nothing below is shippable (round-2 verdict
# weak #1). The sweep continues to gather evidence, but the gate log is
# the go/no-go.
run gate_quick 3600 python benchmarks/compile_gate.py --quick
run gate_full 7200 python benchmarks/compile_gate.py

# 1. headline + per-config tables
run bench 1800 python bench.py
run run_all 7200 python benchmarks/run.py --all

# 1b. headline A/Bs (landed-but-unmeasured levers, individually + combined)
run bench_tile32 1800 env STP_BENCH_TILE=32x16 python bench.py
run bench_bf16 1800 env STP_BENCH_BF16=1 python bench.py
run bench_rankkey 1800 env STP_BENCH_RANKKEY=1 python bench.py
run bench_combo 1800 env STP_BENCH_TILE=32x16 STP_BENCH_BF16=1 STP_BENCH_RANKKEY=1 python bench.py

# 1c. training-quality gate for the winners (must PASS before they become
# defaults — VERDICT r2 #5)
run quality_defaults 3600 python benchmarks/quality_defaults.py

# 2. sort design decision data (profiler device durations, not wall-clock)
run sort_micro 1800 python benchmarks/sort_micro.py --n 3240000

# 2b. quality ladder at config-2 scale (VERDICT #7: sort-error report)
run quality 7200 python benchmarks/quality.py

# 3. profile A/Bs on the headline step (GLOBAL train step)
run prof_global 1200 python benchmarks/profile_step.py --top 20
run prof_rankkey 1200 python benchmarks/profile_step.py --rank-key --top 20
run prof_tile32 1200 python benchmarks/profile_step.py --tile 32x16 --top 20
run prof_bf16 1200 python benchmarks/profile_step.py --carry-bf16 --top 20

# 4. resort modes at config 2 (100K, 800x800): like-for-like fwd vs fwd+bwd
P2="--width 800 --height 800 --gaussians 100000"
run prof_kbuf_fwd 1200 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --fwd-only --top 12
run prof_kbuf 1800 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --top 12
run prof_hier_fwd 1800 python benchmarks/profile_step.py $P2 --mode HIER --fwd-only --top 12
run prof_hier 3600 python benchmarks/profile_step.py $P2 --mode HIER --top 12

# 5. batched mid/head cascade: correctness gate, then A/B
run verify_bcasc 3600 python benchmarks/verify_batched_cascade.py
run prof_hierb_fwd 1800 python benchmarks/profile_step.py $P2 --mode HIER --batched-cascade --fwd-only --top 12
run prof_hierb 3600 python benchmarks/profile_step.py $P2 --mode HIER --batched-cascade --top 12
run prof_hierb_q16 1800 python benchmarks/profile_step.py $P2 --mode HIER --batched-cascade --queues 16,8,4 --fwd-only --top 12
run prof_hier_q16 1800 python benchmarks/profile_step.py $P2 --mode HIER --queues 16,8,4 --fwd-only --top 12

run prof_hierb_cb16 1800 env STP_CASC_BATCH=16 python benchmarks/profile_step.py $P2 --mode HIER --batched-cascade --fwd-only --top 12

# 6. per-entry cascade unroll knob (STP_HIER_UNROLL, default 2)
run prof_hier_u4 1800 env STP_HIER_UNROLL=4 python benchmarks/profile_step.py $P2 --mode HIER --fwd-only --top 12
run prof_hier_u8 1800 env STP_HIER_UNROLL=8 python benchmarks/profile_step.py $P2 --mode HIER --fwd-only --top 12

echo "SWEEP COMPLETE $(date)"

# 7. grouped-tile kbuffer fwd (lane axis = G x 256): Mosaic-compile + A/B
run prof_kbuf_g4_fwd 1800 env STP_KB_GROUP=4 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --fwd-only --top 12
run prof_kbuf_g8_fwd 1800 env STP_KB_GROUP=8 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --fwd-only --top 12
run prof_kbuf_g2_fwd 1800 env STP_KB_GROUP=2 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --fwd-only --top 12

echo "SWEEP EXTRAS COMPLETE $(date)"

# 8. grouped-tile kbuffer fwd+bwd A/B (after the g-fwd cells pick a winner)
run prof_kbuf_g4 2400 env STP_KB_GROUP=4 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --top 12
run prof_kbuf_g2 2400 env STP_KB_GROUP=2 python benchmarks/profile_step.py $P2 --mode PPX_KBUFFER --top 12
