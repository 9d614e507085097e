#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
# wait for run4 to finish (single chip)
while pgrep -f r4_chip_run4.sh > /dev/null; do sleep 20; done
echo "=== bias protocol: mega ==="
BVH_SCHED=mega timeout 1800 $PY scratch/bias_check_form.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
echo "=== bias protocol: sorted gate4 ==="
BVH_SCHED=sorted MXU_GATE=4 timeout 1800 $PY scratch/bias_check_form.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
echo "=== sellmeier speed size 32 ==="
SIZE=32 timeout 1800 $PY scratch/r4_sell_speed.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
echo "=== sellmeier speed size 128 ==="
SIZE=128 timeout 1800 $PY scratch/r4_sell_speed.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
