#!/usr/bin/env python3
"""SCALE_ORACLE at sf10: DuckDB hash-exact verification of the rebanded /
capped dedup+embedding tier AT THE DECADE-PROBE SCALE (500k docs / 200k
vectors), closing VERDICT r11 item 4 — those queries were oracle-exact at
sf1 but only row-counted at sf10.

Usage: python3 tools/scale_oracle_sf10.py <sfDir> <verifyOut> <artifact.json>

Assumes `sbt "runMain graft.Verify <sfDir> <verifyOut> <queries...>"`
already dumped the Spark side. The run loop (per-query local_verify.py
subprocess, hard timeout, infeasible-with-reason discipline, resume on
prior PASS entries) lives in scale_oracle_lib.py, shared with the sf100
slice driver.
"""
import sys

from scale_oracle_lib import run

TIMEOUT = 3600

QUERIES = [
    # the r11 rebanding cluster: dedup_minhash_lsh + its consumers
    "minhash_index_build", "dedup_minhash_lsh", "dedup_containment",
    "dedup_incremental", "dedup_ngram_jaccard", "dedup_verdicts",
    "dedup_band_stats",
    # the r11 capped embedding tier
    "embedding_band_stats", "embedding_neardup",
    # the r12 structural default (blocked winnowing) at decade scale
    "winnowing_pairs",
    # VERDICT r13 item 6: the SimHash connected-components tier measured
    # clean at sf100 but its newest oracle rows were sf1 — the unrolled
    # 20-round min-label CTE is linear in K*(edges+nodes), feasible here
    "dedup_components", "cluster_representatives",
]

CHECK = ("DuckDB hash-exact verification AT SF10 (500k docs / 200k vecs / "
         "10M events) of the tier whose SHAPE changed in r11 (LSH rebanding "
         "16x4, embedding_neardup adaptive width + 400-row bucket cap) plus "
         "the r12 blocked-winnowing default — previously oracle-exact at sf1 "
         "but only row-counted at sf10 (VERDICT r11 item 4)")


def main():
    sfdir, outdir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    run(sfdir, outdir, artifact, QUERIES, CHECK, TIMEOUT)


if __name__ == "__main__":
    main()
