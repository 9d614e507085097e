#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
for cfg in "1M 16" "1M 32" "200k 16"; do
  set -- $cfg
  echo "=== TAG=$1 sorted quad GATE=4 GSIZE=$2 ==="
  TAG=$1 BVH_SCHED=sorted MXU_FORM=quad MXU_GATE=4 MXU_GROUP_SIZE=$2 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | grep -E "RESULT|img mean|Error|error" | head -4
done
echo ALLDONE16
