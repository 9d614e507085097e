#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run8.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== vwarp 64px retry (small vmap chunks) ==="
CH_AD=8 CH_FD=32 timeout 5400 $PY scratch/r5_vwarp_chip.py 2>&1 | grep -vE "$filt"
echo "=== inverse_dispersion fused 128px sppg96 ==="
DIFF_IMPL=fused DISP_SIZE=128 DISP_SPPG=96 timeout 5400 $PY examples/inverse_dispersion.py 2>&1 | grep -vE "$filt"
