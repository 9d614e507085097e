#!/bin/bash
cd /root/repo
while ! grep -q ALLDONE2 scratch/r4_leafsweep2.log 2>/dev/null; do sleep 30; done
echo "=== bench.py driver-config smoke (post leaf-valid fix) ==="
timeout 3000 /opt/venv/bin/python bench.py 2>&1 | grep -vE "^WARNING" | tail -2
echo ALLDONE3
