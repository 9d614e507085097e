#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== fused step 50k mega ==="
SCHED=mega TAG=50k timeout 2400 $PY scratch/r5_fusedstep_chip.py 2>&1 | grep -vE "$filt"
echo "=== fused step 50k sorted ==="
SCHED=sorted TAG=50k timeout 2400 $PY scratch/r5_fusedstep_chip.py 2>&1 | grep -vE "$filt"
echo "=== fused step 10k sorted ==="
SCHED=sorted TAG=10k timeout 2400 $PY scratch/r5_fusedstep_chip.py 2>&1 | grep -vE "$filt"
