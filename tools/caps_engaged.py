#!/usr/bin/env python3
"""Caps-engaged end-to-end verification (VERDICT r12 item 7).

The LSH/blocking bucket caps are DORMANT at every gated scale by design
(the sf0.01 gate's largest MinHash bucket is 4, vs the designed cap of
400) — so the driver's hash-exact gate never exercises the engagement
paths. This driver forces every cap to engage by running graft.Verify
with artificially low GRAFT_CAP_* overrides: the override interpolates
into BOTH the Spark plan and the DuckDB oracle SQL at class-init, so
the caps-engaged outputs must still hash-match DuckDB exactly — DuckDB
independently recomputes the capped candidate sets AND the accounting
queries' dropped-mass columns at the same low caps.

The artifact additionally records the engagement counters read back
from the band-stats outputs (capped_buckets / rows_dropped /
dropped_entries must be NONZERO, i.e. the run genuinely engaged, not
just re-passed the dormant path at a lower number).

Usage: python3 tools/caps_engaged.py [sfDir] [outDir] [artifact]
"""
import glob
import json
import os
import subprocess
import sys

import pandas as pd

CAPS = {
    # sf0.01 bucket landscape: SimHash max bucket 128, MinHash max 4,
    # winnowing max posting list 7 (measured from the dumped band stats
    # — the first run's WIN_FP=30 could never engage there), so these
    # values all engage while leaving every query with nonempty,
    # meaningful output
    "GRAFT_CAP_SIMHASH_BAND": "50",
    "GRAFT_CAP_MINHASH_BAND": "2",
    "GRAFT_CAP_WIN_FP": "3",
    "GRAFT_CAP_WIN_BLOCK": "2",
    "GRAFT_CAP_ND_BUCKET": "2",
}

# every registered query whose plan reads a capped bucket space,
# plus the graph tier that consumes the capped SimHash pair graph
QUERIES = [
    "dedup_minhash_lsh", "dedup_containment", "dedup_ngram_jaccard",
    "dedup_incremental", "dedup_band_stats",
    "dedup_simhash_pairs", "dedup_components", "cluster_representatives",
    "winnowing_pairs", "winnowing_pairs_exact",
    "embedding_band_stats", "embedding_neardup",
]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/caps_out"
    artifact = sys.argv[3] if len(sys.argv) > 3 else "CAPS_ENGAGED_r13.json"
    env = dict(os.environ, **CAPS)
    print(f"[caps] Verify dump at {sfdir} with {CAPS}", flush=True)
    p = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {sfdir} {outdir} " + " ".join(QUERIES)],
        env=env, capture_output=True, text=True)
    fails = [l for l in p.stdout.splitlines() if "failed:" in l]
    if p.returncode != 0 or fails:
        print(p.stdout[-2000:])
        sys.exit(f"Verify dump failed: {fails}")

    print("[caps] DuckDB compare", flush=True)
    v = subprocess.run(
        [sys.executable, "tools/local_verify.py", sfdir, outdir] + QUERIES,
        capture_output=True, text=True)
    lines = [l for l in v.stdout.splitlines()
             if l.startswith(("PASS", "FAIL"))]
    print("\n".join(lines), flush=True)
    results = {}
    for l in lines:
        name = l.split()[1]
        results[name] = {
            "pass": l.startswith("PASS"),
            "rows": int(l.split("(")[1].split(" rows")[0]),
        }

    # engagement counters from the accounting outputs themselves
    def read(name):
        return pd.concat([pd.read_parquet(f)
                          for f in glob.glob(f"{outdir}/{name}/*.parquet")],
                         ignore_index=True)
    band = read("dedup_band_stats")
    emb = read("embedding_band_stats").iloc[0]
    engagement = {
        sp: {"capped_buckets": int(g["capped_buckets"].sum()),
             "rows_dropped": int(g["rows_dropped"].sum()),
             "pairs_avoided": int(g["pairs_avoided"].sum())}
        for sp, g in band.groupby("space")
    }
    engagement["embedding"] = {
        "capped_buckets": int(emb["capped_buckets"]),
        "dropped_entries": int(emb["dropped_entries"]),
        "uncapped_pairs": int(emb["uncapped_pairs"]),
        "swept_pairs": int(emb["swept_pairs"]),
    }
    engaged = all(e.get("capped_buckets", 0) > 0 for e in engagement.values())
    ok = all(r["pass"] for r in results.values()) and len(results) == len(QUERIES)
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    doc = {
        "check": ("hash-exact DuckDB verification with every bucket cap "
                  "FORCIBLY ENGAGED at artificially low values (GRAFT_CAP_* "
                  "overrides interpolate into both the Spark plan and the "
                  "oracle SQL); engagement counters from the accounting "
                  "queries must be nonzero in every capped space"),
        "sf": sfdir,
        "caps": CAPS,
        "rev": rev,
        "pass": ok,
        "engaged_all_spaces": engaged,
        "engagement": engagement,
        "queries": results,
    }
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"[caps] pass={ok} engaged={engaged} -> {artifact}")
    sys.exit(0 if ok and engaged else 1)


if __name__ == "__main__":
    main()
