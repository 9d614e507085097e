#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r4_chip_run7.sh|r4_chip_run8.sh|r4_chip_run9.sh" > /dev/null; do sleep 20; done
for cfg in "50k sorted quad 1" "50k sorted quad 4" "200k sorted quad 4" "50k mega quad 1" "200k sorted quad2 4" "10k sorted quad 4"; do
  set -- $cfg
  echo "=== TAG=$1 BVH_SCHED=$2 MXU_FORM=$3 MXU_GATE=$4 (chunked-v2) ==="
  TAG=$1 BVH_SCHED=$2 MXU_FORM=$3 MXU_GATE=$4 timeout 1800 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge|^\[2m|^E0000|common_lib|Source Location"
  echo "--- done $1 $2 $3 gate$4"
done
