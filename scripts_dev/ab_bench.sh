#!/bin/bash
# Controlled A/B of bench.py: r6 close tree (.ab/r6, commit aa686cc) vs
# r7 close tree (.ab/r7, commit f6826b4), alternating runs so ambient
# drift affects both arms equally. Both arms are PRISTINE worktrees —
# never the live repo, which may carry in-progress edits.
# Usage: bash scripts_dev/ab_bench.sh [n_pairs]   (default 3)
set -u
N=${1:-3}
OUT=/root/repo/.ab/results
mkdir -p "$OUT"
for i in $(seq 1 "$N"); do
  for arm in r6 r7; do
    dir=/root/repo/.ab/$arm
    echo "=== pair $i arm $arm $(date -u +%H:%M:%S) load $(cut -d' ' -f1 /proc/loadavg) ===" >&2
    (cd "$dir" && timeout 1200 python3 bench.py) > "$OUT/${arm}_${i}.json" 2> "$OUT/${arm}_${i}.err"
    echo "rc=$? tail=$(tail -c 120 "$OUT/${arm}_${i}.json")" >&2
  done
done
echo DONE >&2
