#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run5.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== vwarp 64px field520 chip ==="
timeout 5400 $PY scratch/r5_vwarp_chip.py 2>&1 | grep -vE "$filt"
