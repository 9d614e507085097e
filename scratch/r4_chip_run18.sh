#!/bin/bash
cd /root/repo
while pgrep -f "r4_chip_run1[3-7].sh" > /dev/null; do sleep 20; done
echo "=== presplit min N_SWEEPS=2 ==="
N_SWEEPS=2 timeout 2400 /opt/venv/bin/python scratch/r4_presplit_min.py 2>&1 | grep -E "MIN|mean"
