#!/bin/bash
# Serial TPU job chain, round 4 part 5 (one chip — jobs must not overlap).
# Waits for chain4 (pid in /tmp/r4chain4.pid) to exit first.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r4chain4.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done
python benchs/r4/calibrate_surrogate2.py > benchs/logs/r4_calibrate2.log 2>&1
python benchs/r4/probe_add_1m.py         > benchs/logs/r4_add1m.log 2>&1
echo CHAIN5-DONE
