#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run9.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
run() {
  echo "=== fuzz probe SIZE=$1 EPS=$2 K_AD=$3 K_FD=$4 ==="
  PROBE=1 SIZE=$1 EPS=$2 K_AD=$3 K_FD=$4 CH_AD=8 CH_FD=32 timeout 4000 $PY scratch/r5_fuzzwarp_chip.py 2>&1 | grep -aE "AD |FD |RESULT"
}
run 16 0.02 4096 8192
run 64 0.05 64 4096
run 64 0.10 64 4096
run 32 0.02 2048 8192
