#!/usr/bin/env python3
"""SCALE_ORACLE at sf100: DuckDB hash-exact verification at the CENTURY
probe's top scale (5M docs / 2M vectors / 100M events) — 100x the bench
corpus — for the slice where both engines are feasible on this box.

The slice spans the three probe families: the event tier at 100M rows
(windowed top-N, regex-parse top-N, session windows), the rebanded
MinHash tier (index checksum + LSH pairs + the incremental batch
probe, whose oracle's intersection join was re-shaped candidate-first
in r13 after the unconstrained form spilled DuckDB's scratch disk dry
at sf10), and the capped embedding / blocked-winnowing tier.

Usage: python3 tools/scale_oracle_sf100.py <sfDir> <verifyOut> <artifact.json>

Assumes `sbt "runMain graft.Verify <sfDir> <verifyOut> <queries...>"`
already dumped the Spark side for the slice.
"""
import sys

from scale_oracle_lib import run

TIMEOUT = 1800  # per-query cap; at the round clock the deadline file stops the loop

QUERIES = [
    # the four r12 rewrites first (the queries whose sf100 hash evidence
    # VERDICT r12 flagged as missing), so a budget-exhausted run still
    # covers the highest-value slice; dedup_incremental last — its
    # oracle is the most likely to burn the full timeout
    "active_user_windows", "winnowing_pairs", "embedding_neardup",
    # accounting + index tier
    "embedding_band_stats", "minhash_index_build", "dedup_minhash_lsh",
    # event tier at 100M rows
    "q1_hot_items", "q2_hot_pages",
    "dedup_incremental",
    # r14: the SimHash CC tier (dump with GRAFT_CC_ORACLE_ROUNDS=60 —
    # the unroll must cover the sf100 component diameter; the in-query
    # convergence check errors loudly if 60 is short). The und-edge
    # materialization spilled ~70 GB in an ad-hoc r14 probe, so these
    # may record infeasible-by-disk on this box; the sf10 rows are the
    # gated evidence (SCALE_ORACLE_sf10_r14).
    "dedup_components", "cluster_representatives",
]

CHECK = ("DuckDB hash-exact verification AT SF100 (5M docs / 2M vecs / "
         "100M events — 100x the bench corpus, the century probe's top "
         "scale) of one slice per probe family: the event tier, the "
         "16x4-rebanded MinHash tier, and the capped embedding / "
         "blocked-winnowing tier. Every query here is also hash-exact at "
         "sf0.01 (driver gate), sf1 (SCALE_ORACLE_r11), and — dedup/"
         "embedding tier — sf10 (SCALE_ORACLE_sf10_r12).")


def main():
    sfdir, outdir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    run(sfdir, outdir, artifact, QUERIES, CHECK, TIMEOUT)


if __name__ == "__main__":
    main()
