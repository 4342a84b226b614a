#!/bin/bash
# Serial TPU job chain, round 4 part 4 (one chip — jobs must not overlap).
set -x
cd /root/repo
python benchs/r4/r4_queue6.py          > benchs/logs/r4_queue6.log 2>&1
python benchs/r4/calibrate_surrogate.py > benchs/logs/r4_calibrate.log 2>&1
python benchs/r4/search100m_resume.py  > benchs/logs/r4_100m_resume.log 2>&1
echo CHAIN4-DONE
