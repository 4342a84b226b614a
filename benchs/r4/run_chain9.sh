#!/bin/bash
# Serial TPU job chain, round 4 part 9 (one chip — jobs must not overlap).
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r4chain8.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done
python benchs/r4/probe_flat_epilogue2.py > benchs/logs/r4_flat_epilogue2.log 2>&1
echo CHAIN9-DONE
