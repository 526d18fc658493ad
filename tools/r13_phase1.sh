#!/bin/bash
# Round-13 phase-1 serial chain: HEAD test gate -> caps-engaged
# verification (VERDICT r12 item 7) -> century corpora -> POST-FIX sf100
# century sweep (VERDICT r12 item 1). Serialized: concurrent heavy JVMs
# poison executor-CPU measurements on this host (r11/r12 findings).
set -u
cd /root/repo
echo "[phase1] sbt test start $(date +%T)"
if ! sbt -batch test > /tmp/r13_test.log 2>&1; then
  echo "[phase1] TESTS FAILED — aborting (see /tmp/r13_test.log)"
  exit 1
fi
echo "[phase1] tests green $(date +%T)"

python3 tools/caps_engaged.py /root/testdata/sf0.01 /tmp/caps_out \
  CAPS_ENGAGED_r13.json > /tmp/r13_caps.log 2>&1 \
  && echo "[phase1] caps-engaged PASS $(date +%T)" \
  || echo "[phase1] caps-engaged FAILED (see /tmp/r13_caps.log) — continuing"

echo "[phase1] corpus gen start $(date +%T)"
GRAFT_SCALE_SET=sf100 sbt -batch \
  "runMain graft.tools.DecadeProbe testdata_sf10 /tmp/gen_probe.json --gen-only" \
  > /tmp/r13_gen.log 2>&1 \
  || { echo "[phase1] CORPUS GEN FAILED"; exit 1; }
echo "[phase1] corpora ready $(date +%T)"; df -h / | tail -1

GRAFT_SCALE_SET=sf100 SPARK_DRIVER_MEM=96g \
  tools/decade_sweep.sh /tmp/century_tier > /tmp/r13_sweep.log 2>&1
echo "[phase1] sweep done $(date +%T)"
ls -la /tmp/century_tier_*.json
