#!/bin/bash
# Round-5 continuation: close the vwarp 64px story with BLOCK=8 weights.
# Chip AD (the reproducible estimate) + minimal vmap=1 FD tail; the real
# FD truth runs separately on CPU (r5_vwarp_fd_cpu_b8.log) because the
# vmapped plain-render traversal faults on chip (BASELINE round-5 note).
cd /root/repo
PY=/opt/venv/bin/python
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== vwarp 64px BLOCK=8 chip AD (K=192, CH_AD=1: vmapped warp grad OOMs HBM at 64px) ==="
BLOCK=8 K_AD=192 CH_AD=1 K_FD=1 CH_FD=1 timeout 3300 \
  $PY scratch/r5_vwarp_chip.py 2>&1 | grep -vE "$filt"
echo "=== done rc=$? ==="
