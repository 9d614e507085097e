#!/bin/bash
cd /root/repo
while pgrep -f "r4_chip_run1[4-8].sh" > /dev/null; do sleep 20; done
echo "=== gradcmp fused vs xla at +0.08 ==="
GRAD_K=64 timeout 2400 /opt/venv/bin/python scratch/r4_gradcmp.py 2>&1 | grep -E "GRADCMP"
