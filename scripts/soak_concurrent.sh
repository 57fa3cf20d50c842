#!/bin/bash
# Two-process concurrency soak (VERDICT r5 item 6 / r6 item 5): run two
# full graft.Verify dumps CONCURRENTLY in separate JVMs against the same
# sf dir, sharing /tmp scratch (bucketed-layout dirs, spark-warehouse,
# local dirs), then DuckDB-check both outputs independently. Zero
# cross-talk = both sweeps report the same all-OK result a solo run
# does. Usage: scripts/soak_concurrent.sh [sfdir] [outbase]
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft_soak}"
rm -rf "$OUT.a" "$OUT.b"
echo "[soak] launching two concurrent Verify sweeps over $SF"
scripts/run.sh graft.Verify "$SF" "$OUT.a" > "$OUT.a.log" 2>&1 &
PA=$!
scripts/run.sh graft.Verify "$SF" "$OUT.b" > "$OUT.b.log" 2>&1 &
PB=$!
wait $PA; RA=$?
wait $PB; RB=$?
echo "[soak] exit codes: A=$RA B=$RB"
[ $RA -eq 0 ] && [ $RB -eq 0 ]
echo "[soak] checking sweep A"
python3 scripts/check.py "$SF" "$OUT.a" | tail -1
echo "[soak] checking sweep B"
python3 scripts/check.py "$SF" "$OUT.b" | tail -1
