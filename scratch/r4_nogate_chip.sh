#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while ! grep -q ALLDONE6 scratch/r4_bigk_grad.log 2>/dev/null; do sleep 30; done
for cfg in "50k 1" "10k 1" "50k 0"; do
  set -- $cfg
  echo "=== TAG=$1 sorted quad GATE=4 NOGATE=$2 ==="
  TAG=$1 BVH_SCHED=sorted MXU_FORM=quad MXU_GATE=4 MXU_NOGATE=$2 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | tail -7
done
echo ALLDONE7
