#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run4.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== inverse_dispersion fused 128px sppg128 ==="
DIFF_IMPL=fused DISP_SIZE=128 DISP_SPPG=128 timeout 5400 $PY examples/inverse_dispersion.py 2>&1 | grep -vE "$filt"
