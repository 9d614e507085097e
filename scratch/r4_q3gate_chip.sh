#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
for cfg in "10k mega 1" "10k mega 4" "50k sorted 1"; do
  set -- $cfg
  echo "=== quad3 TAG=$1 SCHED=$2 GATE=$3 ==="
  TAG=$1 BVH_SCHED=$2 MXU_FORM=quad3 MXU_GATE=$3 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | grep -E "RESULT|img mean|vector.broadcast|MosaicError|Error" | head -4
done
echo ALLDONE10
