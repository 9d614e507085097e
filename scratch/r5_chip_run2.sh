#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run1.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== fused step 50k mega (retry) ==="
SCHED=mega TAG=50k timeout 2400 $PY scratch/r5_fusedstep_chip.py 2>&1 | grep -vE "$filt"
echo "=== inverse_field 10k chip ==="
timeout 3000 $PY examples/inverse_field.py 2>&1 | grep -vE "$filt"
