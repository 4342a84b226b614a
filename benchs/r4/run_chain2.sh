#!/bin/bash
# Serial TPU job chain, round 4 part 2 (one chip — jobs must not overlap).
set -x
cd /root/repo
python benchs/r4/bench_add_new.py      > benchs/logs/r4_add2.log 2>&1
python benchs/r4/r4_queue4.py          > benchs/logs/r4_queue4.log 2>&1
python benchs/r4/bench_hybrid10m.py    > benchs/logs/r4_hybrid10m_2.log 2>&1
echo CHAIN2-DONE
