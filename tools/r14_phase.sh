#!/bin/bash
# Round-14 serial measurement chain, in priority order. Serialized:
# concurrent heavy JVMs poison executor-CPU measurements on this host
# (r11/r12 findings). Every step checks its exit status AND the
# non-emptiness of the artifact it produces (ADVICE r13: r13_phase2's
# unchecked pin grep could land an empty committed artifact).
set -u
cd /root/repo

wait_quiet() {
  for _ in $(seq 1 40); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$load" 'BEGIN{exit !(l < 4.0)}' && return 0
    echo "[r14] load $load >= 4, waiting 30s"
    sleep 30
  done
  echo "[r14] WARNING: never saw load < 4; proceeding loud"
}

echo "[r14] sbt test gate $(date +%T)"
if ! sbt -batch test > /tmp/r14_phase_test.log 2>&1; then
  echo "[r14] TESTS FAILED — aborting (see /tmp/r14_phase_test.log)"
  exit 1
fi
echo "[r14] tests green $(date +%T)"

echo "[r14] sf10 oracle slice $(date +%T)"
if ! python3 tools/scale_oracle_sf10.py testdata_sf10 /tmp/verify_sf10_r14 \
    SCALE_ORACLE_sf10_r14.json > /tmp/r14_oracle10.log 2>&1; then
  echo "[r14] SF10 ORACLE FAILED (see /tmp/r14_oracle10.log) — continuing"
fi
test -s SCALE_ORACLE_sf10_r14.json || echo "[r14] FAILED: empty SCALE_ORACLE_sf10_r14.json"
tail -3 /tmp/r14_oracle10.log

echo "[r14] sf100 winnowing refresh (post-rescue) $(date +%T)"
if ! SPARK_DRIVER_MEM=96g sbt -batch \
    "runMain graft.Verify testdata_sf100 /tmp/verify_sf100_r14 winnowing_pairs dedup_components cluster_representatives" \
    > /tmp/r14_vdump100.log 2>&1; then
  echo "[r14] SF100 VERIFY DUMP FAILED (see /tmp/r14_vdump100.log)"
else
  # solo compare with the memory budget gate so a co-resident JVM can't
  # be OOM-killed by DuckDB's default 80%-of-RAM appetite (r13's in-loop
  # winnowing death)
  if GRAFT_DUCK_MEM=100GB GRAFT_DUCK_TMP=/root/repo/.tmp/duck \
      python3 tools/local_verify.py testdata_sf100 /tmp/verify_sf100_r14 \
      winnowing_pairs > /tmp/r14_win100.log 2>&1; then
    echo "[r14] sf100 winnowing: $(grep -E '^(PASS|FAIL)' /tmp/r14_win100.log)"
  else
    echo "[r14] SF100 WINNOWING COMPARE FAILED: $(tail -1 /tmp/r14_win100.log)"
  fi
fi

echo "[r14] end-of-round quiet pin $(date +%T)"
wait_quiet
if SPARK_GRAFT_CPUS=4 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_PRETOUCH=1 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.Bench" > /tmp/r14_pin_end.log 2>&1; then
  # bench_out.json carries the FULL wall+cpu maps (the stdout tail line
  # is the compact 15-slowest form — not comparable across rounds)
  if test -s bench_out.json && grep -q '"queries_cpu"' bench_out.json; then
    cp bench_out.json BENCH_PIN_r14_end.json
    python3 tools/bench_compare.py BENCH_PIN_r14_end.json BENCH_PIN_r14_start.json 2>/dev/null | tail -8 || true
  else
    echo "[r14] FAILED: pin produced no full bench_out.json (see /tmp/r14_pin_end.log)"
  fi
else
  echo "[r14] PIN BENCH FAILED (see /tmp/r14_pin_end.log)"
fi
echo "[r14] done $(date +%T)"
