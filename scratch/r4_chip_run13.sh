#!/bin/bash
cd /root/repo
while pgrep -f "r4_chip_run10.sh|r4_chip_run11.sh|r4_chip_run12.sh" > /dev/null; do sleep 20; done
echo "=== inverse_dispersion DIFF_IMPL=fused on chip ==="
DIFF_IMPL=fused timeout 3000 /opt/venv/bin/python examples/inverse_dispersion.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
