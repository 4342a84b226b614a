#!/bin/bash
# Serial TPU job chain for round 4 (one chip — jobs must not overlap).
# Usage: nohup bash benchs/r4/run_chain.sh > benchs/logs/r4_chain.log 2>&1 &
set -x
cd /root/repo
# wait for any running queue2 to finish
while [ -f /tmp/r4q2.pid ] && kill -0 "$(cat /tmp/r4q2.pid)" 2>/dev/null; do
  sleep 30
done
python benchs/r4/bench_add_new.py      > benchs/logs/r4_add.log 2>&1
python benchs/r4/r4_queue3.py          > benchs/logs/r4_queue3.log 2>&1
python benchs/r4/bench_hybrid10m.py    > benchs/logs/r4_hybrid10m.log 2>&1
python benchs/r4/build100m.py          > benchs/logs/r4_build100m.log 2>&1
echo CHAIN-DONE
