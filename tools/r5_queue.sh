#!/bin/bash
# Round-5 measurement queue (VERDICT r4 items 1, 3, 4, 5).
# Sequential so the single TPU chip is never contended; each leg appends
# to its own docs/ file so a killed session loses nothing.
set -u
cd /root/repo
Q=/tmp/r5_queue.log
say() { echo "[$(date +%H:%M:%S)] $*" >> "$Q"; }

# --- Leg 1: finish the headline retune (VERDICT #1) -------------------
RT=docs/retune_r5.jsonl
run_bench() {
  b=$1; f=$2
  if grep -q "\"batch\": $b, \"frontend\": \"$f\", \"result\": {" "$RT"; then
    say "bench b=$b f=$f already recorded"; return
  fi
  say "bench b=$b f=$f ..."
  j=$(timeout 1200 python bench.py --batch "$b" --frontend "$f" 2>/dev/null | tail -1)
  if [ -n "$j" ]; then
    echo "{\"batch\": $b, \"frontend\": \"$f\", \"result\": $j}" >> "$RT"
  else
    echo "{\"batch\": $b, \"frontend\": \"$f\", \"result\": null}" >> "$RT"
  fi
}
run_bench 1536 auto     # re-run: cold-compile timeout first time
run_bench 1280 auto
run_bench 1536 on       # fused frontend below the auto>=2048 threshold
run_bench 1024 on
run_bench 768 auto
say "leg 1 done"

# --- Leg 2: infer2d TB sweep (VERDICT #3) ------------------------------
if [ ! -s docs/profile_r5_D.jsonl ]; then
  say "profile D ..."
  timeout 3600 python tools/profile_r4.py D > docs/profile_r5_D.jsonl 2>/tmp/r5_profD.err
  say "profile D rc=$?"
fi

# --- Leg 3: adaptive 15-row latency table (VERDICT #4) -----------------
if [ ! -s docs/latency_r5.txt ]; then
  say "latency bench ..."
  timeout 5400 python tools/latency_bench.py > docs/latency_r5.txt 2>/tmp/r5_lat.err
  say "latency rc=$?"
fi

# --- Leg 4: full 15-preset train sweep (VERDICT #5) --------------------
if [ ! -s docs/sweep_r5.json ]; then
  say "preset sweep ..."
  timeout 7200 python tools/benchmark.py \
    --presets DSCNNL DSCNNM DSCNNS KWSfpool3 KWSfstride4 \
      Res15 Res15Narrow Res8 Res8Narrow \
      TCResNet14-1.0 TCResNet14-1.5 TCResNet2D8-1.0 TCResNet2D8Pool-1.0 \
      TCResNet8-1.0 TCResNet8-1.5 \
    --batch 1024 --steps-per-call 50 \
    --out docs/sweep_r5.json > /tmp/r5_sweep.log 2>&1
  say "sweep rc=$?"
fi
say "QUEUE COMPLETE"
