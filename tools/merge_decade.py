#!/usr/bin/env python3
"""Merge per-tier DecadeProbe partial artifacts into one SCALE_sf10 file.

Usage: merge_decade.py <out.json> <tier0.json> <tier1.json> ...

Each partial is a full DecadeProbe artifact for one memo tier, produced
in its own fresh JVM (tools/decade_sweep.sh). Query entries concatenate
in tier order; the aggregate superlinear/failed/dark lists and sf10
totals are recomputed from the merged map; the budget/methodology
strings come from the first partial (identical across tiers) plus the
per-tier-JVM note.
"""
import json
import sys


def main():
    out, parts = sys.argv[1], sys.argv[2:]
    queries = {}
    heap = set()
    base = None
    for p in parts:
        with open(p) as f:
            d = json.load(f)
        if base is None:
            base = d
        heap.add(d.get("heap_gb"))
        for k, v in d["queries"].items():
            assert k not in queries, f"duplicate query {k} across tiers"
            queries[k] = v
    doc = {
        "probe": base["probe"],
        "timing": base["timing"],
        "metric": base["metric"],
        "heap_gb": sorted(heap)[0] if len(heap) == 1 else sorted(heap),
        "corpus_sf10": base["corpus_sf10"],
        "budget": base["budget"],
        "tier_resets": base.get("tier_resets"),
        "per_tier_jvm": (
            "one fresh JVM per memo tier (tools/decade_sweep.sh, load-gated "
            "< 4.0 before each tier): a single-JVM full sweep inflates late "
            "queries 5-20x in executor CPU via kernel-side fault storms that "
            "track the process's grown RSS on this memory-overcommitted host "
            "(30+ cores of guest sys-time, zero in-guest reclaim, GC/code-"
            "cache clean) — the artifact behind the r11 18-28x/decade "
            "'growth cluster' and two poisoned r12 full-sweep attempts; "
            "per-tier JVMs bound the footprint like a real cluster's "
            "per-stage executors"),
        "nqueries": len(queries),
        "superlinear": [k for k, v in queries.items() if v["verdict"] == "SUPER"],
        "failed": [k for k, v in queries.items() if v["verdict"] == "FAILED"],
        "dark": [k for k, v in queries.items()
                 if v["verdict"] != "FAILED" and v["rows"][2] == 0],
        "total_cpu_sf10": round(sum(v["cpu"][2] for v in queries.values()), 3),
        "total_wall_sf10": round(sum(v["wall"][2] for v in queries.values()), 3),
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"merged {len(parts)} tiers / {len(queries)} queries -> {out}; "
          f"super={doc['superlinear']} failed={doc['failed']} dark={doc['dark']}")


if __name__ == "__main__":
    main()
