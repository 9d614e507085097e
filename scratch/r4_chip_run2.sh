#!/bin/bash
cd /root/repo
PY=/opt/venv/bin/python
# 200k pickle (clean CPU env) if missing
if [ ! -f .bench_field200k.pkl ]; then
  PYTHONPATH= JAX_PLATFORMS=cpu $PY -c "
import pickle, sys
import numpy as np, jax
sys.path.insert(0, '/root/repo')
from spectral_tpu.models.scenes import build_tri_field
s = build_tri_field(200016, seed=0)
pickle.dump(jax.tree_util.tree_map(np.asarray, s), open('/root/repo/.bench_field200k.pkl', 'wb'))
print('200k pickle done')"
fi
for cfg in "10k sorted quad" "50k sorted quad2" "200k sorted quad" "200k mega quad"; do
  set -- $cfg
  echo "=== TAG=$1 BVH_SCHED=$2 MXU_FORM=$3 ==="
  TAG=$1 BVH_SCHED=$2 MXU_FORM=$3 timeout 1800 $PY scratch/r4_chip_sorted.py 2>&1 | grep -v "^WARNING.*xla_bridge"
  echo "--- done $1 $2 $3"
done
