#!/bin/bash
cd /root/repo
echo "=== quad3 10k mega GATE=4 (degraded -> whole-tile) ==="
TAG=10k BVH_SCHED=mega MXU_FORM=quad3 MXU_GATE=4 timeout 2400 /opt/venv/bin/python scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | grep -E "RESULT|img mean|Error|error" | head -4
echo ALLDONE11
