#!/bin/bash
cd /root/repo
while pgrep -f "r4_chip_run11.sh|r4_chip_run12.sh|r4_chip_run13.sh" > /dev/null; do sleep 20; done
echo "=== XLA truth 24-seed ==="
BIAS_K=24 timeout 2400 /opt/venv/bin/python scratch/r4_xla_bias.py 2>&1 | grep -E "XLA-TRUTH"
