#!/bin/bash
# Serial TPU job chain, round 4 part 12 (one chip — jobs must not overlap).
set -x
cd /root/repo
while kill -0 "$(cat /tmp/r4chain11.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done
python benchs/r4/r4_queue10.py > benchs/logs/r4_queue10.log 2>&1
echo CHAIN12-DONE
