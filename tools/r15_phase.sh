#!/bin/bash
# Round-15 serial measurement chain (the commands actually run this
# round, in order — committed for reproducibility like r13/r14's).
# Serialized: concurrent heavy JVMs poison executor-CPU measurements on
# this host (r11/r12 findings), and a DuckDB sweep must never overlap a
# timed Spark run.
set -u
cd /root/repo

wait_quiet() {
  for _ in $(seq 1 40); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$load" 'BEGIN{exit !(l < 4.0)}' && return 0
    echo "[r15] load $load >= 4, waiting 30s"
    sleep 30
  done
  echo "[r15] WARNING: never saw load < 4; proceeding loud"
}

echo "[r15] sbt test gate $(date +%T)"
sbt -batch test > /tmp/r15_test.log 2>&1 || { echo "[r15] TESTS FAILED"; exit 1; }

echo "[r15] sf0.01 gate $(date +%T)"
sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r15_full' \
  > /tmp/r15_gate_dump.log 2>&1
python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_r15_full \
  | tail -1

echo "[r15] FULL-REGISTRY sf10 dump $(date +%T)"
SPARK_GRAFT_CPUS=24 SPARK_DRIVER_MEM=80g \
  sbt -batch 'runMain graft.Verify testdata_sf10 /tmp/verify_full_sf10_r15' \
  > /tmp/r15_sf10_dump.log 2>&1

echo "[r15] FULL-REGISTRY sf10 oracle sweep $(date +%T)"
GRAFT_DUCK_MEM=100GB GRAFT_DUCK_TMP=/root/repo/.tmp/duck \
  GRAFT_ORACLE_BUDGET=10800 \
  python3 tools/full_oracle_sf10.py testdata_sf10 /tmp/verify_full_sf10_r15 \
  FULL_ORACLE_sf10_r15.json > /tmp/r15_oracle10.log 2>&1 || true
test -s FULL_ORACLE_sf10_r15.json || echo "[r15] FAILED: empty artifact"
tail -3 /tmp/r15_oracle10.log

echo "[r15] CC sf100 infeasibility MEASURED bound (VERDICT item 7) $(date +%T)"
# bounded-spill probe: dies at a recorded temp cap instead of filling
# the box (reuses the r14 sf100 Spark dump — DuckDB dies before compare)
GRAFT_DUCK_MEM=100GB GRAFT_DUCK_TMP=/root/repo/.tmp/duck \
  GRAFT_DUCK_TMP_MAX=55GB \
  timeout 3600 python3 tools/local_verify.py testdata_sf100 \
  /tmp/verify_sf100_r14 dedup_components > /tmp/r15_cc100.log 2>&1 || true
tail -2 /tmp/r15_cc100.log

echo "[r15] century probes for the r15 set extension (tiers 9-10) $(date +%T)"
wait_quiet
GRAFT_SCALE_SET=sf100 SPARK_GRAFT_PRETOUCH=1 SPARK_DRIVER_MEM=96g \
  sbt -batch "runMain graft.tools.DecadeProbe testdata_sf10 /tmp/decade_r15_9.json tier:9" \
  2>&1 | grep -E "\[decade\]" || true
wait_quiet
GRAFT_SCALE_SET=sf100 SPARK_GRAFT_PRETOUCH=1 SPARK_DRIVER_MEM=96g \
  sbt -batch "runMain graft.tools.DecadeProbe testdata_sf10 /tmp/decade_r15_10.json tier:10" \
  2>&1 | grep -E "\[decade\]" || true

echo "[r15] end-of-round quiet pin $(date +%T)"
wait_quiet
if SPARK_GRAFT_CPUS=4 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_PRETOUCH=1 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.Bench" > /tmp/r15_pin_end.log 2>&1; then
  if test -s bench_out.json && grep -q '"queries_cpu"' bench_out.json; then
    cp bench_out.json BENCH_PIN_r15_end.json
    python3 tools/bench_compare.py BENCH_PIN_r15_end.json BENCH_PIN_r14_end.json \
      2>/dev/null | tail -8 || true
  fi
fi
echo "[r15] done $(date +%T)"
