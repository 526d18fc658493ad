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

CHANGED_AT_HEAD is a committed snapshot AS OF 69240f9 (the r15 sf10
sweep close). It is NOT self-updating: e5579d8 rewrote the
neardup_pagerank/neardup_triangles/neardup_graph_build oracles after
the list's first draft and an arg-less rerun would have silently
skipped them (ADVICE r15) — they are appended below. As a guard, an
arg-less run now refuses to proceed when `git diff --name-only
<AS_OF_REV>..HEAD -- src` is non-empty: pass the changed queries
explicitly (or refresh the list + AS_OF_REV) instead of trusting a
stale snapshot.
"""
import subprocess
import sys

from scale_oracle_lib import run

TIMEOUT = 3600

# rev the list below was audited against; bump it whenever the list is
# refreshed from `git diff --name-only <old>..<new> -- src`
AS_OF_REV = "69240f9"

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
    # e5579d8 (post first-draft, ADVICE r15): graph-tier oracle rewrites
    # (AS MATERIALIZED CTEs + windowed pagerank fold)
    "neardup_pagerank", "neardup_triangles", "neardup_graph_build",
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
    queries = sys.argv[4:]
    if not queries:
        drift = subprocess.run(
            ["git", "diff", "--name-only", f"{AS_OF_REV}..HEAD", "--", "src"],
            capture_output=True, text=True).stdout.strip()
        if drift:
            sys.exit(
                f"CHANGED_AT_HEAD is a snapshot as of {AS_OF_REV}, but src/ "
                f"has changed since:\n{drift}\n"
                "Pass the affected queries explicitly, or refresh the list "
                "and bump AS_OF_REV.")
        queries = CHANGED_AT_HEAD
    run(sfdir, outdir, artifact, queries, CHECK, TIMEOUT)


if __name__ == "__main__":
    main()
