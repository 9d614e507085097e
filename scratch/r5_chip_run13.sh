#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r5_chip_run12.sh" > /dev/null; do sleep 20; done
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
run() {
  echo "=== fuzz block probe SIZE=$1 BLOCK=$2 EPS=$3 ==="
  PROBE=1 SIZE=$1 BLOCK=$2 EPS=$3 K_AD=2048 K_FD=4096 CH_AD=8 CH_FD=32 timeout 4000 $PY scratch/r5_fuzzwarp_chip.py 2>&1 | grep -aE "AD |FD |RESULT"
}
run 64 8 0.02
run 64 4 0.02
run 64 16 0.02
