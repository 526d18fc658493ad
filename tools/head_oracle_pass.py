#!/usr/bin/env python3
"""Second (HEAD) pass over FULL_ORACLE_sf10_r15.json: re-verify exactly
the queries whose engine/oracle source changed after the breadth sweep's
rev (d3adb96 — the sweep ran while r15 landed the dsir signed-zero fix,
the U3 exact-boundary QRound sweep, and the feasible value_band_join
oracle), against a fresh HEAD dump. Rows for untouched queries keep
their d3adb96 stamps — `git diff --name-only d3adb96..HEAD -- src` is
the audit trail that their source is identical.

Usage: python3 tools/head_oracle_pass.py <sfdir> <headDumpDir> <artifact> [query...]
With explicit query args, runs those (e.g. the deadline-unreached tail
against the ORIGINAL dump dir); without, runs the changed-query list
against the HEAD dump dir.
"""
import sys

from scale_oracle_lib import run

TIMEOUT = 3600

CHANGED_AT_HEAD = [
    "dsir_selection", "percentile_normalization", "target_encoding",
    "mixture_alpha_sample", "mixture_manifest", "doc_entropy",
    "source_divergence", "incremental_agg_merge", "boilerplate_spans",
    "skew_audit", "join_size_estimate", "stratified_sample",
    "doc_repetition", "ngram_lm_perplexity", "pipeline_funnel",
    "dedup_containment", "winnowing_pairs", "winnowing_pairs_exact",
    "dedup_ngram_jaccard", "pair_edit_distance", "bm25_search",
    "hybrid_search_rrf", "hybrid_search_rrf_indexed", "quantile_summary",
    "value_band_join",
]

CHECK = ("FULL-REGISTRY DuckDB hash-exact verification at sf10 (500k docs "
         "/ 200k vectors / 10M events), TWO-PHASE: breadth pass at d3adb96 "
         "(every SQL-expressible query, per-query local_verify under the "
         "100 GB DuckDB budget), then a HEAD pass re-verifying exactly the "
         "queries r15 changed after the breadth rev (dsir signed-zero fix, "
         "U3 exact-boundary QRound sweep, feasible value_band_join oracle) "
         "plus the breadth pass's deadline tail — per-row `rev` stamps "
         "record which pass certified each query; `git diff --name-only "
         "<rev>..HEAD -- src` audits that unchanged-stamp rows' source is "
         "identical")


def main():
    sfdir, outdir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    queries = sys.argv[4:] or CHANGED_AT_HEAD
    run(sfdir, outdir, artifact, queries, CHECK, TIMEOUT)


if __name__ == "__main__":
    main()
