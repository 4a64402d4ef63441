#!/usr/bin/env bash
# Full train-step regime sweep (VERDICT r4 next #2): flagship-scale
# bench_train.py across every shading regime the fastpath gate can select,
# plus the static-maps off ablation. One JSON line per regime appended to
# reports/train_regimes_r5.jsonl. ~10 min/regime on the chip (compile
# dominates; prerender is cached after the first run).
set -u
OUT=${OUT:-/root/repo/reports/train_regimes_r5.jsonl}
STEPS=${STEPS:-10}
VIEWS=${VIEWS:-2}
mkdir -p "$(dirname "$OUT")"
: > "$OUT"
for regime in tables hybrid8 mc-baked mc-pixel mc-raytrace; do
  echo "[regimes] $regime $(date -u +%H:%M:%S)"
  timeout 2400 python bench_train.py --regime "$regime" \
    --steps "$STEPS" --views "$VIEWS" 2>&1 \
    | tail -1 | tee -a "$OUT"
done
echo "[regimes] tables + static maps OFF $(date -u +%H:%M:%S)"
timeout 2400 python bench_train.py --regime tables --no-static-maps \
  --steps "$STEPS" --views "$VIEWS" 2>&1 | tail -1 \
  | sed 's/"regime": "tables"/"regime": "tables-nostatic"/' | tee -a "$OUT"
echo "[regimes] done"
