#!/usr/bin/env bash
# Full-scale cycles-parity evidence run with auto-resume.
#
# The remote-TPU tunnel drops sporadically mid-run (broken pipe /
# remote_compile transport errors); tools/cycles_parity.py checkpoints every
# exact-MC view (--checkpoint), so the correct reaction is simply to rerun
# until it exits 0. This wrapper does that, with a bounded retry budget and
# a small back-off so a wedged worker doesn't spin us.
#
# Scale notes: one exact-MC 512^2 view costs ~2.5 min of device time (256
# GGX samples/texel through the BVH, chunked dispatches). The canonical rig
# is 128 views; we measure an evenly-strided subset (default 16) at the
# canonical indices — checkpoints stay valid if a later run grows the
# subset toward all 128.
set -u
VIEWS=${VIEWS:-128}
LIMIT=${LIMIT:-16}
ENVS=${ENVS:-5}
RES=${RES:-512}
CK=${CK:-/root/cycles_ck}
OUT=${OUT:-/root/repo/reports/cycles_parity_full.jsonl}
TRIES=${TRIES:-30}
mkdir -p "$(dirname "$OUT")" "$CK"
for i in $(seq 1 "$TRIES"); do
  echo "[run_cycles_parity_full] attempt $i/$TRIES $(date -u +%H:%M:%S)"
  timeout 5400 python tools/cycles_parity.py \
    --views "$VIEWS" --limit-views "$LIMIT" --envs "$ENVS" --res "$RES" \
    --checkpoint "$CK" --out-json "$OUT" "$@"
  rc=$?
  [ "$rc" -eq 0 ] && { echo "[run_cycles_parity_full] done"; exit 0; }
  echo "[run_cycles_parity_full] exit $rc — retrying after back-off"
  sleep 60
done
echo "[run_cycles_parity_full] retry budget exhausted" >&2
exit 1
