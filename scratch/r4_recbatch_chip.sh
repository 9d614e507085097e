#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
for cfg in "10k quad3 mega" "50k quad sorted" "200k quad sorted"; do
  set -- $cfg
  echo "=== recbatch A/B TAG=$1 FORM=$2 SCHED=$3 ==="
  TAG=$1 MXU_FORM=$2 BVH_SCHED=$3 MXU_GATE=4 timeout 2400 $PY scratch/r4_recbatch_ab.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | tail -8
done
echo ALLDONE5
