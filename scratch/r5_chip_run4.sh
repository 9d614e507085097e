#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run3.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== inverse_field 10k chip (fixed-noise) ==="
timeout 3000 $PY examples/inverse_field.py 2>&1 | grep -vE "$filt"
