#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run10.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
for cfg in "50k sorted" "10k sorted" "200k sorted" "1M sorted" "10k mega" "50k mega"; do
  set -- $cfg
  echo "=== best8 ladder TAG=$1 SCHED=$2 GATE=4 ==="
  TAG=$1 BVH_SCHED=$2 MXU_GATE=4 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vaE "$filt"
done
