#!/bin/bash
cd /root/repo
while pgrep -f "r4_chip_run7.sh|r4_chip_run8.sh|r4_chip_run9.sh|r4_chip_run10.sh" > /dev/null; do sleep 20; done
echo "=== mega injected-host-rand 48-seed ==="
BIAS_K=48 BVH_SCHED=mega timeout 1800 /opt/venv/bin/python scratch/r4_streamcheck.py 2>&1 | grep -E "MEGA-INJECTED"
