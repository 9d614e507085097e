#!/bin/bash
cd /root/repo
for v in clip wideclip edge2 edge2wide; do
  PYTHONPATH= JAX_PLATFORMS=cpu /opt/venv/bin/python scratch/r4_dispbias.py $v 2>&1 | grep -v WARNING
done
