#!/bin/bash
# Serial TPU job chain, round 4 part 7 (one chip — jobs must not overlap).
# Waits for chain6 (pid in /tmp/r4chain6.pid — the launching subshell) to
# exit first, then for any straggling probe_flat_epilogue process.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r4chain6.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done
python benchs/r4/r4_queue7.py > benchs/logs/r4_queue7.log 2>&1
echo CHAIN7-DONE
