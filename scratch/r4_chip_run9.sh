#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r4_chip_run5.sh|r4_chip_run6.sh|r4_chip_run7.sh|r4_chip_run8.sh" > /dev/null; do sleep 20; done
echo "=== sellmeier speed size 32 (fixed) ==="
SIZE=32 timeout 1800 $PY scratch/r4_sell_speed.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
echo "=== sellmeier speed size 128 ==="
SIZE=128 timeout 1800 $PY scratch/r4_sell_speed.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
