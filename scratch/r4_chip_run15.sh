#!/bin/bash
cd /root/repo
while pgrep -f "r4_chip_run1[0-4].sh" > /dev/null; do sleep 20; done
echo "=== sellmeier speed size 32 (jitted) ==="
SIZE=32 timeout 1800 /opt/venv/bin/python scratch/r4_sell_speed.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
echo "=== sellmeier speed size 128 (jitted) ==="
SIZE=128 timeout 1800 /opt/venv/bin/python scratch/r4_sell_speed.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
