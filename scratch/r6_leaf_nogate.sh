#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
run() {
  echo "=== TAG=50k sorted nogate GATE=1 MXU_LEAF=$1 full ==="
  env TAG=50k BVH_SCHED=sorted MXU_GATE=1 MXU_NOGATE=1 MXU_LEAF=$1 \
    timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "$filt"
}
run 1024
run 256
