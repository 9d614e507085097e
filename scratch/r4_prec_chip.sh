#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while ! grep -q ALLDONE8 scratch/r4_dispfused_chip.log 2>/dev/null; do sleep 30; done
echo "=== 50k sorted quad DEFAULT-precision timing bound ==="
TAG=50k BVH_SCHED=sorted MXU_FORM=quad MXU_GATE=4 MXU_PRECISION=default timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | tail -7
echo "=== 50k sorted quad3 NARROW (winner-only) ==="
TAG=50k BVH_SCHED=sorted MXU_FORM=quad3 MXU_Q3_NARROW=1 MXU_GATE=4 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | tail -7
echo "=== 50k sorted quad3 top-2 ==="
TAG=50k BVH_SCHED=sorted MXU_FORM=quad3 MXU_GATE=4 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | tail -7
echo ALLDONE9
