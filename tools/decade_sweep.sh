#!/bin/bash
# Per-tier fresh-JVM decade sweep (r12 methodology): one DecadeProbe JVM
# per memo tier, so no tier's measurement runs in a process fattened by
# another's. A single-JVM full sweep inflates late queries 5-20x in
# executor CPU on this host — kernel-side fault storms that track grown
# RSS (memory-overcommitted hypervisor), vanish in fresh JVMs, and
# poisoned the r11 growth cluster plus two full r12 sweep attempts.
# Each tier JVM still runs its builds before its consumers at all three
# scales with the probe's own budget/retry discipline; partial artifacts
# merge via tools/merge_decade.py.
#
# Usage: tools/decade_sweep.sh [outPrefix]   (from /root/repo)
# GRAFT_SCALE_SET=sf100 runs the same sweep one decade higher
# (sf1 -> sf10 -> sf100); corpora generate idempotently in tier 0's JVM
# unless pre-generated with `runMain graft.tools.DecadeProbe x y --gen-only`.
set -u
prefix="${1:-/tmp/decade_tier}"
export GRAFT_SCALE_SET="${GRAFT_SCALE_SET:-sf10}"
# fault the whole heap in at JVM startup, outside any timed query (see
# build.sbt: the century sweep's first heavy sf100 query otherwise pays
# the 2g->96g heap ramp as a one-time 17x executor-CPU fault storm)
export SPARK_GRAFT_PRETOUCH=1
ntiers=11
for i in $(seq 0 $((ntiers - 1))); do
  # committed-artifact discipline: wait out ambient load before each tier
  for _ in $(seq 1 60); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$load" 'BEGIN{exit !(l < 4.0)}' && break
    echo "[sweep] load $load >= 4, waiting 30s before tier $i"
    sleep 30
  done
  echo "[sweep] tier $i start $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)"
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}" \
    sbt -batch "runMain graft.tools.DecadeProbe testdata_sf10 ${prefix}_${i}.json tier:$i" \
    2>&1 | grep -E "\[decade\]"
done
echo "[sweep] all tiers done -> ${prefix}_{0..$((ntiers - 1))}.json"
