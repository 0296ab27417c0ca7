#!/bin/bash
# Dev loop: run Verify for a query-name-prefix subset inside the
# long-lived tmux sbt session, wait for the prompt, then selfcheck.
# Usage: tools/vq.sh q268[,q269,...] [outdir]
set -u
PREFIXES="$1"
OUT="${2:-/tmp/vq_$(echo "$PREFIXES" | tr ',' '_')}"
tmux send-keys -t sbt "runMain graft.Verify /root/testdata/sf0.01 $OUT $PREFIXES" Enter
sleep 5
for i in $(seq 1 90); do
  sleep 6
  last=$(tmux capture-pane -t sbt -p | grep -vE "^\s*$" | tail -1)
  if echo "$last" | grep -q "temporalretrieverspark"; then break; fi
done
tmux capture-pane -t sbt -p | grep -E "\[verify\].*failed" | tail -5
python3 "$(dirname "$0")/selfcheck.py" /root/testdata/sf0.01 "$OUT"
