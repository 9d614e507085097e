#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run6.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
run() {
  echo "=== probe TAG=50k nogate SCOREONLY=$1 NOUPDATE=$2 ==="
  TAG=50k BVH_SCHED=sorted MXU_GATE=1 MXU_NOGATE=1 MXU_PROBE_SCOREONLY=$1 MXU_PROBE_NOUPDATE=$2 \
    timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "$filt"
}
run 0 0
run 0 1
run 1 0
