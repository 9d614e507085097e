#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r4_chip_run1[1-5].sh" > /dev/null; do sleep 20; done
run() {
  echo "=== TAG=$1 SCHED=$2 FORM=$3 GATE=$4 LEAF=$5 ==="
  TAG=$1 BVH_SCHED=$2 MXU_FORM=$3 MXU_GATE=$4 MXU_LEAF=$5 timeout 1800 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge|^\[2m|^E0000|common_lib|Source Location"
}
run 50k sorted quad 4 128
run 50k sorted quad 4 256
run 50k sorted quad 4 512
run 50k sorted quad 1 256
run 200k sorted quad 4 256
run 1M sorted quad 4 256
run 200k mega quad 1 256
