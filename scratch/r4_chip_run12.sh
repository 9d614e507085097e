#!/bin/bash
cd /root/repo
while pgrep -f "r4_chip_run9.sh|r4_chip_run10.sh|r4_chip_run11.sh" > /dev/null; do sleep 20; done
echo "=== presplit minimal sweep-only kernel ==="
timeout 1800 /opt/venv/bin/python scratch/r4_presplit_min.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
