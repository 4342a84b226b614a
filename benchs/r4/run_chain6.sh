#!/bin/bash
# Serial TPU job chain, round 4 part 6 (one chip — jobs must not overlap).
# Waits for chain5 (pid in /tmp/r4chain5.pid) to exit first.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r4chain5.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done
python benchs/r4/probe_flat_epilogue.py > benchs/logs/r4_flat_epilogue.log 2>&1
echo CHAIN6-DONE
