#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run7.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== fuzzwarp 64px chip ==="
timeout 5400 $PY scratch/r5_fuzzwarp_chip.py 2>&1 | grep -vE "$filt"
echo "=== inverse_field 50k chip ==="
N_TRIS=50016 STEPS=60 timeout 4000 $PY examples/inverse_field.py 2>&1 | grep -vE "$filt"
