#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
while pgrep -f "r4_chip_run5.sh|r4_chip_run6.sh" > /dev/null; do sleep 20; done
# 1M field pickle (CPU)
if [ ! -f .bench_field1M.pkl ]; then
  PYTHONPATH= JAX_PLATFORMS=cpu $PY -c "
import pickle, sys
import numpy as np, jax
sys.path.insert(0, '/root/repo')
from spectral_tpu.models.scenes import build_tri_field
s = build_tri_field(1000064, seed=0)
pickle.dump(jax.tree_util.tree_map(np.asarray, s), open('/root/repo/.bench_field1M.pkl', 'wb'))
print('1M pickle done')"
fi
echo "=== shared-rand A/B 10k ==="
TAG=10k timeout 1800 $PY scratch/r4_sharedrand_ab.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
echo "=== bias 48-seed mega ==="
BIAS_K=48 BVH_SCHED=mega timeout 1800 $PY scratch/bias_check_form.py 2>&1 | grep "FORM="
echo "=== bias 48-seed sorted ==="
BIAS_K=48 BVH_SCHED=sorted MXU_GATE=4 timeout 1800 $PY scratch/bias_check_form.py 2>&1 | grep "FORM="
echo "=== 1M sorted gate4 ==="
TAG=1M BVH_SCHED=sorted MXU_FORM=quad MXU_GATE=4 timeout 1800 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
echo "=== 1M mega ==="
TAG=1M BVH_SCHED=mega MXU_FORM=quad timeout 1800 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "^WARNING|^\[2m|^E0000|common_lib|Source Location"
