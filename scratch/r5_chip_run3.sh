#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run2.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
for cfg in "200k 0" "200k 1" "1M 1" "1M 0" "50k 1"; do
  set -- $cfg
  echo "=== L2 ladder TAG=$1 MXU_GROUP_L2=$2 ==="
  TAG=$1 BVH_SCHED=sorted MXU_GATE=4 MXU_GROUP_L2=$2 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "$filt"
done
