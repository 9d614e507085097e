#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run17.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== vwarp FD-only CH_FD=4 ==="
SKIP_AD=1 CH_FD=4 K_FD=2048 timeout 4000 $PY scratch/r5_vwarp_chip.py 2>&1 | grep -aE "FD |RESULT|rror" | head -4
