#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
echo "=== HEAD: TAG=50k sorted quad GATE=4 LEAF=128 ==="
TAG=50k BVH_SCHED=sorted MXU_FORM=quad MXU_GATE=4 timeout 1800 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | tail -12
echo "=== HEAD: TAG=50k sorted quad GATE=1 LEAF=128 ==="
TAG=50k BVH_SCHED=sorted MXU_FORM=quad MXU_GATE=1 timeout 1800 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | tail -12
