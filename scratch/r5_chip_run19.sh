#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
echo "=== vwarp 64px BLOCK=8 AD+FD (chip, FD at vmap=1) ==="
BLOCK=8 EPS=3 CH_AD=1 K_AD=384 CH_FD=1 K_FD=1024 timeout 7200 $PY scratch/r5_vwarp_chip.py 2>&1 | grep -aE "AD |FD |RESULT|sigma|OK|rror"
