#!/bin/bash
# Round-13 phase-2 serial chain (runs after tools/r13_phase1.sh), in
# PRIORITY order so a clock-exhausted round still lands the highest-
# value artifacts first:
#   1. merge century tiers -> SCALE_sf100_r13.json (VERDICT r12 item 1)
#   2. BENCH_PIN_r13 (timing-sensitive; host is quiet right after the
#      sweep ends, and DuckDB oracle churn would poison it later)
#   3. stratified winnowing recall at sf1+sf10 (VERDICT r12 item 6)
#   4. sf100 Verify dump + oracle slice (VERDICT r12 items 2 + 5)
#   5. sf10 oracle refresh at HEAD stamps (ADVICE r12 stale-rev resume)
# Serialized for the same reason as phase 1: concurrent heavy JVMs
# poison executor-CPU measurements on this host.
set -u
cd /root/repo

echo "[phase2] merge century tiers $(date +%T)"
python3 tools/merge_decade.py SCALE_sf100_r13.json /tmp/century_tier_*.json \
  || { echo "[phase2] MERGE FAILED"; exit 1; }
python3 - <<'EOF'
import json
d = json.load(open("SCALE_sf100_r13.json"))
print("[phase2] sweep summary: superlinear=%s failed=%s dark=%s" % (
    d.get("superlinear"), d.get("failed"), d.get("dark")))
EOF

echo "[phase2] pin bench $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)"
for _ in $(seq 1 40); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  awk -v l="$load" 'BEGIN{exit !(l < 4.0)}' && break
  echo "[phase2] load $load >= 4, waiting 30s before pin"
  sleep 30
done
SPARK_GRAFT_CPUS=4 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_PRETOUCH=1 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Bench" > /tmp/r13_pin.log 2>&1
grep '"metric"' /tmp/r13_pin.log | tail -1 > BENCH_PIN_r13.json
python3 tools/bench_compare.py BENCH_PIN_r13.json BENCH_PIN_r12.json \
  | tail -15 || true

echo "[phase2] caps-engaged rerun $(date +%T)"
python3 tools/caps_engaged.py /root/testdata/sf0.01 /tmp/caps_out \
  CAPS_ENGAGED_r13.json > /tmp/r13_caps.log 2>&1 \
  && echo "[phase2] caps-engaged PASS (all spaces engaged)" \
  || echo "[phase2] caps-engaged FAILED (see /tmp/r13_caps.log) — continuing"

echo "[phase2] winnow recall probe $(date +%T)"
SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.tools.WinnowRecallProbe WINNOW_RECALL_r13.json testdata_sf1 testdata_sf10" \
  > /tmp/r13_winrecall.log 2>&1 \
  && echo "[phase2] winnow recall PASS" \
  || echo "[phase2] winnow recall FAILED (see /tmp/r13_winrecall.log) — continuing"

echo "[phase2] sf100 Verify dump $(date +%T)"
SPARK_DRIVER_MEM=96g sbt -batch \
  "runMain graft.Verify testdata_sf100 /tmp/verify_sf100 active_user_windows winnowing_pairs embedding_neardup embedding_band_stats minhash_index_build dedup_minhash_lsh q1_hot_items q2_hot_pages dedup_incremental" \
  > /tmp/r13_vdump100.log 2>&1 \
  || echo "[phase2] sf100 verify dump FAILED — oracle will record failures"
echo "[phase2] sf100 oracle $(date +%T)"
python3 tools/scale_oracle_sf100.py testdata_sf100 /tmp/verify_sf100 \
  SCALE_ORACLE_sf100_r13.json > /tmp/r13_oracle100.log 2>&1
tail -4 /tmp/r13_oracle100.log

echo "[phase2] sf10 Verify dump $(date +%T)"
SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.Verify testdata_sf10 /tmp/verify_sf10 minhash_index_build dedup_minhash_lsh dedup_containment dedup_incremental dedup_ngram_jaccard dedup_verdicts dedup_band_stats embedding_band_stats embedding_neardup winnowing_pairs" \
  > /tmp/r13_vdump10.log 2>&1 \
  || echo "[phase2] sf10 verify dump FAILED — oracle will record failures"
echo "[phase2] sf10 oracle $(date +%T)"
python3 tools/scale_oracle_sf10.py testdata_sf10 /tmp/verify_sf10 \
  SCALE_ORACLE_sf10_r13.json > /tmp/r13_oracle10.log 2>&1
tail -4 /tmp/r13_oracle10.log
echo "[phase2] done $(date +%T)"
