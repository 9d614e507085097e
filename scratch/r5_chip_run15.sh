#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run14.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== vwarp 64px retry3 (no callback on chip) ==="
CH_AD=1 K_AD=256 CH_FD=32 timeout 5400 $PY scratch/r5_vwarp_chip.py 2>&1 | grep -vaE "$filt"
