#!/bin/bash
cd /root/repo
while ! grep -q ALLDONE5 scratch/r4_recbatch_chip.log 2>/dev/null; do sleep 30; done
echo "=== big-K gradcmp at +0.08 / +0.04 (K=1500) ==="
GRAD_K=1500 DISP_OFFS=0.08,0.04 GRAD_IMPLS=fused,xla timeout 9000 /opt/venv/bin/python scratch/r4_gradcmp.py 2>&1 | grep -E "GRADCMP"
echo ALLDONE6
