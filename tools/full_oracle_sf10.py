#!/usr/bin/env python3
"""FULL-REGISTRY DuckDB hash-exact verification at sf10 (500k docs /
200k vectors / 10M events) — VERDICT r14 item 3: the sf1 full sweep
(FULL_ORACLE_sf1_r14) caught two real knife edges sf0.01 could never
sample; this is the next decade of the same ratchet.

Usage:
  sbt "runMain graft.Verify testdata_sf10 <verifyOut>"   # dump all
  python3 tools/full_oracle_sf10.py testdata_sf10 <verifyOut> FULL_ORACLE_sf10_r15.json

The query list is read from <verifyOut>/oracle_sql.json (the Verify
dump's own registry — exactly the SQL-expressible set; rows-only
queries have no oracle and are out of scope by design). Known-heavy
oracles run LAST so a budget stop costs the tail, not the breadth.
Resume/stale/infeasible discipline comes from scale_oracle_lib.
"""
import json
import sys

from scale_oracle_lib import run

TIMEOUT = 3600

# oracles measured or expected heaviest at this scale (dedup_incremental
# was 27.1s at sf10 in r14 but needs the 100 GB budget gate; the CC
# min-label CTE and the exact winnowing report are the known tails) —
# deferred to the end of the loop
HEAVY_LAST = [
    "q1_hot_items", "q2_hot_pages", "q6_marketing_by_channel",
    "q10_order_timeout", "q10_order_timeout_fsm", "scd2_user_state",
    "winnowing_pairs", "winnowing_pairs_exact", "dedup_incremental",
    "dedup_components", "cluster_representatives", "label_propagation",
    "neardup_pagerank",
]

CHECK = ("FULL-REGISTRY DuckDB hash-exact verification at sf10 (500k docs "
         "/ 200k vectors / 10M events — 10x the r14 full-registry sf1 "
         "sweep): every SQL-expressible registered query dumped by "
         "graft.Verify on testdata_sf10 and compared per-query by "
         "tools/local_verify.py under the 100 GB DuckDB budget gate; "
         "timeouts / resource exhaustion recorded as infeasible with the "
         "measured reason, never silently skipped")


def main():
    sfdir, outdir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(f"{outdir}/oracle_sql.json") as f:
        registry = sorted(json.load(f).keys())
    queries = [q for q in registry if q not in HEAVY_LAST] + \
        [q for q in HEAVY_LAST if q in registry]
    print(f"== {len(queries)} oracled queries at {sfdir}", flush=True)
    run(sfdir, outdir, artifact, queries, CHECK, TIMEOUT)


if __name__ == "__main__":
    main()
