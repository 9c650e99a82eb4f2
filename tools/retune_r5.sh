#!/bin/bash
# Round-5 headline retune: full train-step throughput over batch x frontend.
# Each row: {"batch":N,"frontend":"...","result":{...bench.py json...}}
OUT=/root/repo/docs/retune_r5.jsonl
: > "$OUT"
run() {
  b=$1; f=$2
  echo "=== batch=$b frontend=$f ===" >&2
  j=$(timeout 900 python /root/repo/bench.py --batch "$b" --frontend "$f" 2>/dev/null | tail -1)
  if [ -n "$j" ]; then
    echo "{\"batch\": $b, \"frontend\": \"$f\", \"result\": $j}" >> "$OUT"
  else
    echo "{\"batch\": $b, \"frontend\": \"$f\", \"result\": null}" >> "$OUT"
  fi
}
run 1536 auto
run 2048 auto
run 4096 auto
run 2048 off
run 4096 off
run 3072 auto
run 1024 auto
run 8192 auto
echo DONE >> "$OUT"
