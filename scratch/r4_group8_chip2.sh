#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
for cfg in "1M 1" "200k 1" "50k 1"; do
  set -- $cfg
  echo "=== TAG=$1 sorted quad GATE=4 GROUP8=$2 ==="
  TAG=$1 BVH_SCHED=sorted MXU_FORM=quad MXU_GATE=4 MXU_GROUP8=$2 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | grep -E "RESULT|img mean|Error|error" | head -4
done
echo "=== presplit min LOOPED N_SWEEPS=4 ==="
LOOPED=1 N_SWEEPS=4 timeout 2400 $PY scratch/r4_presplit_min.py 2>&1 | grep -E "MIN|mean|Error" | head -8
echo ALLDONE13
