#!/usr/bin/env python3
"""SCALE_ORACLE at sf10: DuckDB hash-exact verification of the rebanded /
capped dedup+embedding tier AT THE DECADE-PROBE SCALE (500k docs / 200k
vectors), closing VERDICT r11 item 4 — those queries were oracle-exact at
sf1 but only row-counted at sf10.

Usage: python3 tools/scale_oracle_sf10.py <sfDir> <verifyOut> <artifact.json>

Assumes `sbt "runMain graft.Verify <sfDir> <verifyOut> <queries...>"`
already dumped the Spark side. Each DuckDB compare runs local_verify.py
in a subprocess under a hard timeout (default 3600 s — sf10 is 10x the
sf1 corpus the 1800 s budget was sized for); a timeout records the query
as infeasible-with-reason rather than failing the artifact, matching the
SCALE_ORACLE_r10 precedent (dedup_components at sf1).
"""
import json
import subprocess
import sys
import time

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
]


def main():
    sfdir, outdir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    results, infeasible, failed = {}, {}, {}
    # resume: PASS entries from a prior artifact are kept verbatim (the
    # compare is deterministic); failed/infeasible entries re-attempt
    try:
        with open(artifact) as f:
            results = json.load(f).get("pass", {})
    except (FileNotFoundError, ValueError):
        pass
    for q in QUERIES:
        if q in results:
            print(f"SKIP {q}: passed in prior run ({results[q]['rows']} rows)",
                  flush=True)
            continue
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "tools/local_verify.py", sfdir, outdir, q],
                capture_output=True, text=True, timeout=TIMEOUT)
            out = p.stdout.strip().splitlines()
            line = next((l for l in out if l.startswith(("PASS", "FAIL"))), "")
            secs = round(time.time() - t0, 1)
            if line.startswith(f"PASS {q} (") and "rows-only" not in line:
                rows = int(line.split("(")[1].split(" rows")[0])
                results[q] = {"rows": rows, "oracle_sec": secs}
                print(f"PASS {q} rows={rows} {secs}s", flush=True)
            elif "No space left on device" in line or "Out of Memory" in line:
                # resource exhaustion is an ORACLE limit, not an engine
                # mismatch: DuckDB's plan for this query spills past the
                # box's 77 GB free at sf10 (the engine side passed at
                # sf1 hash-exact and is row-band-gated at sf10)
                infeasible[q] = (f"DuckDB oracle exhausts local resources at "
                                 f"sf10 ({line.split(':')[-1].strip()[:120]}); "
                                 f"sf1 twin is hash-exact")
                print(f"INFEASIBLE {q}: resource exhaustion ({secs}s)", flush=True)
            else:
                failed[q] = {"detail": line or p.stderr[-300:], "oracle_sec": secs}
                print(f"FAIL {q}: {line}", flush=True)
        except subprocess.TimeoutExpired:
            infeasible[q] = (f"DuckDB oracle exceeded {TIMEOUT}s at sf10 "
                             f"(50k-doc sf1 twin passes; engine-side probe "
                             f"row-band still gates this query)")
            print(f"INFEASIBLE {q}: >{TIMEOUT}s", flush=True)
    doc = {
        "check": ("DuckDB hash-exact verification AT SF10 (500k docs / 200k vecs / "
                  "10M events) of the tier whose SHAPE changed in r11 (LSH rebanding "
                  "16x4, embedding_neardup adaptive width + 400-row bucket cap) plus "
                  "the r12 blocked-winnowing default — previously oracle-exact at sf1 "
                  "but only row-counted at sf10 (VERDICT r11 item 4)"),
        "method": (f"graft.Verify dump on {sfdir} -> tools/local_verify.py per query "
                   f"(same column-sort/row-sort exact compare as the driver's gate), "
                   f"{TIMEOUT}s DuckDB timeout each"),
        "pass": results,
        "infeasible": infeasible,
        "fail": failed,
    }
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"== {len(results)} pass, {len(failed)} fail, "
          f"{len(infeasible)} infeasible -> {artifact}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
