#!/bin/bash
# Queue9d sequence: build-once (saved index), instrumented search,
# save-path re-measure — each phase a fresh process so HBM state from
# one phase cannot poison the next (queue9b/9c lesson).
cd /root/repo
L=benchs/logs
python benchs/r5/r5_queue9d.py --build    > $L/r5_queue9d_build.log  2>&1
python benchs/r5/r5_queue9d.py --search   > $L/r5_queue9d_search.log 2>&1
python benchs/r5/r5_queue9d.py --savepath > $L/r5_queue9d_save.log   2>&1
echo "queue9d sequence done" >> $L/r5_queue9d_build.log
