#!/usr/bin/env python3
"""FULL-REGISTRY DuckDB hash-exact verification at sf100 (5M docs /
2M vectors / 100M events) — VERDICT r15 item 1: the ratchet's top rung.
sf1 caught two knife edges (r14), sf10 caught two whole new divergence
classes (r15: signed zero, exact-boundary ratios); sf100 samples 10x
the sf10 population and is where ROUND_AUDIT.md's S3 table predicts
the first cosine-sim/libm-ulp hit could land.

Usage:
  GRAFT_CC_ORACLE_ROUNDS=60 sbt "runMain graft.Verify testdata_sf100 <verifyOut>"
  GRAFT_DUCK_MEM=100GB GRAFT_DUCK_TMP=/root/repo/.tmp/duck \
    GRAFT_ORACLE_BUDGET=<sec> \
    python3 tools/full_oracle_sf100.py testdata_sf100 <verifyOut> FULL_ORACLE_sf100_r16.json

Query list comes from <verifyOut>/oracle_sql.json (the dump's own
registry — exactly the SQL-expressible set). Known-heavy oracles run
LAST so a budget stop costs the tail, not the breadth. Timeouts and
resource exhaustion are recorded as infeasible WITH the measured
number (VERDICT r15: "accept disclosed infeasibles — record each with
its number and its sf10 pass row as terminal evidence"); the CC tier
is pre-measured infeasible on this box (51.2 GiB spill cap,
SCALE_ORACLE_sf100_r15) and left in the loop so the artifact records
it from a live attempt, not hearsay.
"""
import json
import sys

from scale_oracle_lib import run

TIMEOUT = 1800

# oracles measured heaviest in the sf10 full sweep (scaled 10x here)
# plus the tiers SCALE_ORACLE_sf100_r15 already measured as
# disk/time-infeasible at this scale — deferred to the end of the loop
HEAVY_LAST = [
    "scd2_user_state", "embedding_project", "label_propagation",
    "sessionize", "ann_pq", "embedding_neardup", "ann_index_probe",
    "ann_index_build", "ann_ivf_pq", "content_defined_chunks",
    "ngram_lm_perplexity", "value_band_join", "winnowing_pairs",
    "winnowing_pairs_exact", "dedup_incremental", "q1_hot_items",
    "q2_hot_pages", "q6_marketing_by_channel", "q10_order_timeout",
    "q10_order_timeout_fsm", "neardup_pagerank",
    # the measured-infeasible CC tier (51.2 GiB und-edge spill at r15)
    "dedup_components", "cluster_representatives",
]

CHECK = ("FULL-REGISTRY DuckDB hash-exact verification at sf100 (5M docs "
         "/ 2M vectors / 100M events — 10x the r15 full-registry sf10 "
         "sweep, 100x the bench corpus): every SQL-expressible registered "
         "query dumped by graft.Verify on testdata_sf100 and compared "
         "per-query by tools/local_verify.py under the 100 GB DuckDB "
         "budget gate; timeouts / resource exhaustion recorded as "
         "infeasible with the measured reason, never silently skipped")

# VERDICT r15 item 4: ROUND_AUDIT.md's S3 exposure table promoted into
# the artifact schema, so a future single-hit sweep is adjudicated
# against its prediction instead of read as systemic. Incidence model:
# ~1e-9/value for the shortest-repr knife edge on generic doubles, PLUS
# the QRound-irreducible libm channel (exp/ln differ from the JVM by
# 1 ulp on ~0.3% of inputs; a 1-ulp input difference flips any
# quantization with probability ulp/step).
EXPECTED_HITS = {
    "model": ("per-surface expected hits at sf100 = knife-edge incidence "
              "(~1e-9/value) x output-value count; libm-ulp channel "
              "bounded separately (0.3% x ulp/step). A sampled hit on an "
              "S3 surface within budget is a predicted event -> fix is "
              "the mechanical engine+oracle QRound swap (r15 precedent), "
              "not a systemic failure."),
    "surfaces": {
        "ann simr/d2r rank pins": {"values": 1e6, "expected_hits": 1e-3},
        "pq lut block distances": {"values": 5e6, "expected_hits": 5e-3},
        "ivf coarse-cell distances": {"values": 1e5, "expected_hits": 1e-4},
        "embedding_neardup verify sims": {"values": 1e7, "expected_hits": 1e-2},
        "per-doc text scores": {"values": 5e6, "expected_hits": 5e-3},
        "per-user folds (ewma, rolling z)": {"values": 1e8, "expected_hits": 0.1},
        "tfidf/pmi/perplexity log-scores": {"values": 1e7, "expected_hits": 1e-2},
    },
    "total_expected_hits": 0.14,
    "source": "ROUND_AUDIT.md S3 table (r15), counts at sf100",
}


def main():
    sfdir, outdir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(f"{outdir}/oracle_sql.json") as f:
        registry = sorted(json.load(f).keys())
    queries = [q for q in registry if q not in HEAVY_LAST] + \
        [q for q in HEAVY_LAST if q in registry]
    print(f"== {len(queries)} oracled queries at {sfdir}", flush=True)
    try:
        run(sfdir, outdir, artifact, queries, CHECK, TIMEOUT)
    finally:
        # graft the expected-hits block onto whatever the runner wrote
        # (it flushes after every query, including on deadline exit)
        try:
            with open(artifact) as f:
                doc = json.load(f)
            doc["expected_hits"] = EXPECTED_HITS
            with open(artifact, "w") as f:
                json.dump(doc, f, indent=1)
                f.write("\n")
        except (FileNotFoundError, ValueError):
            pass


if __name__ == "__main__":
    main()
