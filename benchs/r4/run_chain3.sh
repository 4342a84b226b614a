#!/bin/bash
# Serial TPU job chain, round 4 part 3 (one chip — jobs must not overlap).
set -x
cd /root/repo
python benchs/r4/r4_queue5.py          > benchs/logs/r4_queue5.log 2>&1
python benchs/r4/hybrid10m_build.py    > benchs/logs/r4_hybrid10m_build.log 2>&1
python benchs/r4/hybrid10m_search.py   > benchs/logs/r4_hybrid10m_search.log 2>&1
echo CHAIN3-DONE
