#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
# wait for the fix-validate job to finish (log marker, no pkill patterns)
while ! grep -q ALLDONE scratch/r4_fix_validate.log 2>/dev/null; do sleep 30; done
for cfg in "50k 256" "50k 512" "200k 256" "200k 512"; do
  set -- $cfg
  echo "=== TAG=$1 sorted quad GATE=4 LEAF=$2 ==="
  TAG=$1 BVH_SCHED=sorted MXU_FORM=quad MXU_GATE=4 MXU_LEAF=$2 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | tail -8
done
echo "=== inverse_dispersion DIFF_IMPL=fused spp_g=64 ==="
DIFF_IMPL=fused timeout 3600 $PY examples/inverse_dispersion.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location" | tail -22
echo ALLDONE2
