#!/bin/bash
# Serial TPU job chain, round 4 part 8 (one chip — jobs must not overlap).
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r4chain7.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done
python benchs/r4/calibrate_surrogate3.py > benchs/logs/r4_calibrate3.log 2>&1
echo CHAIN8-DONE
