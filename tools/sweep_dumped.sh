#!/bin/bash
# Incremental oracle sweep over whatever queries the (still-running)
# Verify dump has already completed: verifies each _SUCCESS-marked dump
# not yet PASS-stamped in the artifact, so the multi-hour DuckDB sweep
# overlaps the multi-hour Spark dump instead of serializing after it.
# Heavy oracles (the full_oracle_sf100.py HEAVY_LAST set) are skipped
# here — they need the full 100 GB DuckDB budget after the dump JVM
# exits; this pass runs with a reduced budget to coexist with it.
#
# Usage: tools/sweep_dumped.sh <sfDir> <dumpDir> <artifact> [duckMem]
set -u
cd /root/repo
SFDIR=$1; DUMP=$2; ART=$3; MEM=${4:-30GB}

HEAVY=$(python3 - <<'EOF'
import importlib.util, sys
spec = importlib.util.spec_from_file_location("fo", "tools/full_oracle_sf100.py")
m = importlib.util.module_from_spec(spec)
sys.modules["scale_oracle_lib"] = type(sys)("scale_oracle_lib")
sys.modules["scale_oracle_lib"].run = lambda *a, **k: None
spec.loader.exec_module(m)
print(" ".join(m.HEAVY_LAST))
EOF
)

DONE=$(python3 - "$DUMP" "$ART" "$HEAVY" <<'EOF'
import json, os, sys
dump, art = sys.argv[1], sys.argv[2]
heavy = set(sys.argv[3].split())
try:
    passed = set(json.load(open(art)).get("pass", {}))
except (FileNotFoundError, ValueError):
    passed = set()
oracles = set(json.load(open(f"{dump}/oracle_sql.json")))
ready = [q for q in sorted(oracles)
         if q not in passed and q not in heavy
         and os.path.exists(f"{dump}/{q}/_SUCCESS")]
print(" ".join(ready))
EOF
)

if [ -z "$DONE" ]; then
  echo "[sweep-dumped] nothing new to verify"
  exit 0
fi
echo "[sweep-dumped] verifying: $DONE"
# bounded spill (r15 CC-probe mode): an oracle that outgrows the cap
# dies at a MEASURED temp bound instead of filling the box's free space
# out from under the co-resident dump JVMs (the r16 ENOSPC cascade)
GRAFT_DUCK_MEM=$MEM GRAFT_DUCK_TMP=/root/repo/.tmp/duck \
  GRAFT_DUCK_TMP_MAX=${GRAFT_DUCK_TMP_MAX:-35GB} \
  python3 tools/head_oracle_pass.py "$SFDIR" "$DUMP" "$ART" $DONE
