#!/bin/bash
# Round-16 measurement chain — the commands actually run this round, in
# order, committed for reproducibility like r13/r14/r15's. Unlike those
# rounds this one was NOT a clean serial chain: the sf100 full-registry
# dump is a multi-hour Spark job on a 125 GiB box that OOM-killed three
# sizing attempts (96g solo + ballooning DuckDB; 40g+56g pair; 24g+48g
# pair during an unbounded-spill ENOSPC cascade), so the final shape is
# (a) the dump split into restartable per-query-list JVMs (64g cap),
# (b) the DuckDB sweep overlapped INCREMENTALLY over whatever the dump
# had finished (tools/sweep_dumped.sh, bounded 18GB mem / 35GB spill /
# 36G vmem), and (c) the timed artifacts taken in an explicit
# stop-the-world quiet window. This file records that shape honestly;
# the per-phase commands below are runnable as written.
#
# ADVICE r15 item 2 applied: pipefail + hard gate exits — a failing
# sf0.01 gate must abort the chain, never roll into the sf100 phases.
set -u -o pipefail
cd /root/repo

wait_quiet() {
  for _ in $(seq 1 40); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$load" 'BEGIN{exit !(l < 4.0)}' && return 0
    echo "[r16] load $load >= 4, waiting 30s"
    sleep 30
  done
  echo "[r16] WARNING: never saw load < 4; proceeding loud"
}

echo "[r16] sbt test gate $(date +%T)"
sbt -batch test > /tmp/r16_test.log 2>&1 || { echo "[r16] TESTS FAILED"; exit 1; }

echo "[r16] sf0.01 gate $(date +%T)"
sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r16_full' \
  > /tmp/r16_gate_dump.log 2>&1 || { echo "[r16] GATE DUMP FAILED"; exit 1; }
python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_r16_full \
  | tee /tmp/r16_gate.log | tail -1
grep -q " 0 fail ==" /tmp/r16_gate.log || { echo "[r16] GATE FAILED"; exit 1; }

echo "[r16] sf10 bounds for the rows-only sketch trio (VERDICT item 6) $(date +%T)"
SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM=24g \
  tools/run_main.sh graft.tools.BoundsCheck testdata_sf10 BOUNDS_sf10_r16.json \
  > /tmp/r16_bounds.log 2>&1 || { echo "[r16] BOUNDS VIOLATED"; exit 1; }

echo "[r16] sf100 FULL-REGISTRY dump (restartable; 64g cap — see header) $(date +%T)"
# run per remaining-query list; on an OOM kill, recompute the list and
# relaunch (completed per-query dirs carry _SUCCESS markers):
#   GRAFT_CC_ORACLE_ROUNDS=60 SPARK_GRAFT_CPUS=20 SPARK_DRIVER_MEM=64g \
#     tools/run_main.sh graft.Verify testdata_sf100 /tmp/verify_full_sf100_r16 <remaining...>
# overlapped incremental oracle sweep (every 60-120s while the dump runs):
#   tools/sweep_dumped.sh testdata_sf100 /tmp/verify_full_sf100_r16 \
#     FULL_ORACLE_sf100_r16.json 18GB

echo "[r16] quiet-window timed artifacts (dumps+sweep STOPPED first) $(date +%T)"
wait_quiet
SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM=20g \
  tools/run_main.sh graft.tools.StreamBench testdata_sf1 STREAMBENCH_r16.json 20 \
  > /tmp/r16_streambench.log 2>&1 || echo "[r16] STREAMBENCH FAILED"
wait_quiet
SPARK_GRAFT_CPUS=4 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_PRETOUCH=1 SPARK_DRIVER_MEM=48g \
  tools/run_main.sh graft.Bench > /tmp/r16_pin_end.log 2>&1 \
  && grep -q '"queries_cpu"' bench_out.json \
  && cp bench_out.json BENCH_PIN_r16_end.json \
  && python3 tools/bench_compare.py BENCH_PIN_r16_end.json BENCH_PIN_r15_end.json | tail -8
wait_quiet
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g SPARK_GRAFT_PRETOUCH=1 \
  tools/run_main.sh graft.tools.RelationalDecadeProbe SCALE_REL_r16.json \
  > /tmp/r16_relprobe.log 2>&1 || echo "[r16] REL PROBE FAILED"

echo "[r16] final big-budget oracle pass (heavies solo, dumps stopped) $(date +%T)"
GRAFT_DUCK_MEM=100GB GRAFT_DUCK_TMP=/root/repo/.tmp/duck \
  GRAFT_DUCK_TMP_MAX=55GB GRAFT_ORACLE_BUDGET=3600 \
  GRAFT_ORACLE_TRUST_REVS="$(python3 -c "
import json
revs={r.get('rev','') for r in json.load(open('FULL_ORACLE_sf100_r16.json'))['pass'].values()}
print(','.join(sorted(revs)))")" \
  python3 tools/full_oracle_sf100.py testdata_sf100 /tmp/verify_full_sf100_r16 \
  FULL_ORACLE_sf100_r16.json > /tmp/r16_oracle100_final.log 2>&1 || true
tail -3 /tmp/r16_oracle100_final.log
echo "[r16] done $(date +%T)"
