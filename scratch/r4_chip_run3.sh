#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
for cfg in "50k sorted quad 4" "200k sorted quad 4" "10k sorted quad 4" "50k sorted quad 8"; do
  set -- $cfg
  echo "=== TAG=$1 BVH_SCHED=$2 MXU_FORM=$3 MXU_GATE=$4 ==="
  TAG=$1 BVH_SCHED=$2 MXU_FORM=$3 MXU_GATE=$4 timeout 1800 $PY scratch/r4_chip_sorted.py 2>&1 | grep -v "^WARNING.*xla_bridge"
  echo "--- done $1 $2 $3 gate$4"
done
