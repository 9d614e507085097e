#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r4_chip_run1[2-6].sh" > /dev/null; do sleep 20; done
echo "=== 96-seed mega hwprng ==="
BIAS_K=96 BVH_SCHED=mega timeout 2400 $PY scratch/bias_check_form.py 2>&1 | grep -E "^seed|FORM="
echo "=== 96-seed sorted host ==="
BIAS_K=96 BVH_SCHED=sorted MXU_GATE=4 timeout 2400 $PY scratch/bias_check_form.py 2>&1 | grep -E "^seed|FORM="
echo "=== 96-seed mega injected ==="
BIAS_K=96 BVH_SCHED=mega timeout 2400 $PY scratch/r4_streamcheck.py 2>&1 | grep -E "^seed|MEGA-INJECTED"
