#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run16.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== vwarp FD-only ==="
PROBE=1 SKIP_AD=1 CH_FD=32 K_FD=4096 timeout 3000 $PY scratch/r5_vwarp_chip.py 2>&1 | grep -aE "AD |FD |RESULT|rror" | head -6
