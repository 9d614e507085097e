#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while ! grep -q ALLDONE3 scratch/r4_bench_smoke2.log 2>/dev/null; do sleep 30; done
echo "=== merged-pack 50k sorted GATE=4 LEAF=128 ==="
TAG=50k BVH_SCHED=sorted MXU_FORM=quad MXU_GATE=4 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | tail -8
echo "=== merged-pack 200k sorted GATE=4 LEAF=128 ==="
TAG=200k BVH_SCHED=sorted MXU_FORM=quad MXU_GATE=4 timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING.*xla_bridge" | tail -8
echo "=== gradcmp offset sweep (fused vs xla, K=96) ==="
GRAD_K=96 DISP_OFFS=0.01,0.02,0.04,0.08 timeout 5400 $PY scratch/r4_gradcmp.py 2>&1 | grep -E "GRADCMP"
echo ALLDONE4
