#!/bin/bash
cd /root/repo
while ! grep -q ALLDONE7 scratch/r4_nogate_chip.log 2>/dev/null; do sleep 30; done
echo "=== inverse_dispersion fused @64px ==="
DIFF_IMPL=fused timeout 5400 /opt/venv/bin/python examples/inverse_dispersion.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location" | tail -20
echo ALLDONE8
