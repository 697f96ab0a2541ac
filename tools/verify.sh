#!/bin/bash
# Drive the warm sbt shell in tmux session `sbt`: run graft.Verify on
# $1 (default sf0.01) into $2 (default /tmp/vout), wait for completion
# (oracle_sql.json is written last), then run the local oracle check.
set -u
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/vout}
FILTER=${3:-}
rm -rf "$OUT"
START=$(date +%s)
tmux send-keys -t sbt "runMain graft.Verify $SF $OUT $FILTER" Enter
for i in $(seq 1 240); do
  sleep 5
  if [ -f "$OUT/oracle_sql.json" ]; then
    MT=$(stat -c %Y "$OUT/oracle_sql.json")
    if [ "$MT" -ge "$START" ]; then
      sleep 2
      echo "--- verify stderr failures (if any):"
      tmux capture-pane -t sbt -p -S -2000 | grep "\[verify\]" | tail -30
      python3 "$(dirname "$0")/check.py" "$SF" "$OUT"
      exit $?
    fi
  fi
done
echo "TIMEOUT waiting for Verify"
exit 2
