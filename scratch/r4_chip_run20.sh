#!/bin/bash
cd /root/repo
while pgrep -f "r4_chip_run1[5-9].sh" > /dev/null; do sleep 20; done
echo "=== bench.py driver-config smoke ==="
timeout 3000 /opt/venv/bin/python bench.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location" | tail -3
