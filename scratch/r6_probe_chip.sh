#!/bin/bash
# Round-6 go/no-go: group-batched-scoring timing probe
# (scratch/r6_groupscore_design.md; probe implemented round-5 close,
# CPU-interpret-smoked in r6_probe_smoke.py, goldens bit-exact with it
# OFF at MXU_GATE=1 and 4).
#
# Protocol: all four variants share the all-miss trajectory class of
# the r5 probes (SCOREONLY/NOUPDATE never propose; GROUPSCORE's RMW is
# never-taken by construction) so their group visitation is identical;
# "full" is the production reference with real trajectories. Read:
#   GROUPSCORE ~= SCOREONLY  -> batching is free; the 8x chain cut is
#                               real -> build the exact batched path.
#   GROUPSCORE ~= gsz*SCOREONLY -> latency is per-matmul-issue; lever
#                               dead. Document the negative.
cd /root/repo
PY=/opt/venv/bin/python
filt='^WARNING|^\[2m|^E0000|common_lib|Source Location|xla_bridge'
run() {
  echo "=== TAG=50k sorted nogate $1 ==="
  env TAG=50k BVH_SCHED=sorted MXU_GATE=1 MXU_NOGATE=1 $2 \
    timeout 2400 $PY scratch/r4_chip_sorted.py 2>&1 | grep -vE "$filt"
}
while [ ! -s /root/repo/.bench_field50k.pkl ]; do sleep 15; done
# groupscore first: the other three have round-5 reference numbers
# (1654 / 380 / 382 ms-class, scratch/r5_chip_run7.log) — rerunning
# them here only controls for service-queue noise. First pass of this
# script: full (the only variant whose env survived a $2-expansion
# bug) measured best 1651 ms — dead on the r5 number, queue noise nil.
run groupscore "MXU_PROBE_GROUPSCORE=1"
run noupdate "MXU_PROBE_NOUPDATE=1"
run scoreonly "MXU_PROBE_SCOREONLY=1"
run full ""
