#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
for cfg in "50k sorted 4" "10k sorted 4" "200k sorted 4" "1M sorted 4" "200k mega 1"; do
  set -- $cfg
  echo "=== TAG=$1 SCHED=$2 GATE=$3 (leaf-valid fix) ==="
  TAG=$1 BVH_SCHED=$2 MXU_FORM=quad MXU_GATE=$3 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | tail -8
done
echo ALLDONE
