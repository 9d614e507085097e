#!/bin/bash
# Round-6 precursor: re-run the MXU_LEAF ladder under the ROUND-5 sweep
# (best8 one-shot update + group DMA + L2 gate — the round-4b "LEAF
# 256/512 flat" study predates all three) in the PRODUCTION config.
# Motivation: the groupscore probe (r6_probe_chip2.log) showed one
# batched chain link per 8-leaf group = 359 ms vs 1651 ms for 8
# per-leaf links at identical visitation; a bigger leaf IS exact
# batched scoring with coarser gating (leaf-centering at K'=8K = the
# group-centered rebasing), zero new kernel code. If visitation growth
# doesn't cancel the 8x chain cut (the round-4b claim), this ships.
cd /root/repo
PY=/opt/venv/bin/python
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
run() {
  echo "=== TAG=$1 sorted GATE=4 MXU_LEAF=$2 ==="
  env TAG=$1 BVH_SCHED=sorted MXU_GATE=4 MXU_LEAF=$2 \
    timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "$filt"
}
run 50k 128
run 50k 256
run 50k 512
run 50k 1024
