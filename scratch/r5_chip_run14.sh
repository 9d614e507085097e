#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run13.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
run() {
  echo "=== groupdma TAG=$1 MXU_GROUP_DMA=$2 ==="
  TAG=$1 BVH_SCHED=sorted MXU_GATE=4 MXU_GROUP_DMA=$2 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vaE "$filt"
}
run 50k 1
run 50k 0
run 200k 1
run 1M 1
run 10k 1
