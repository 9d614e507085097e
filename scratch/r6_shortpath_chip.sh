#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
run() {
  echo "=== TAG=$1 sorted GATE=4 MXU_SHORTPATH=$2 ==="
  env TAG=$1 BVH_SCHED=sorted MXU_GATE=4 MXU_SHORTPATH=$2 \
    timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "$filt"
}
run 50k 1
run 10k 1
