#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run15.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== vwarp 64px retry4 (K_AD=768, cached compile) ==="
CH_AD=1 K_AD=768 CH_FD=32 K_FD=4096 timeout 8000 $PY scratch/r5_vwarp_chip.py 2>&1 | grep -vaE "$filt"
