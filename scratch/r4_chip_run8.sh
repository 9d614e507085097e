#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r4_chip_run5.sh|r4_chip_run6.sh|r4_chip_run7.sh" > /dev/null; do sleep 20; done
echo "=== presplit chip A/B ==="
timeout 1800 $PY scratch/r4_presplit_div.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
