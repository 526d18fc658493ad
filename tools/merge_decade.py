#!/usr/bin/env python3
"""Merge per-tier DecadeProbe partial artifacts into one SCALE file.

Usage: merge_decade.py <out.json> <tier0.json> <tier1.json> ...

Each partial is a full DecadeProbe artifact for one memo tier, produced
in its own fresh JVM (tools/decade_sweep.sh). Query entries concatenate
in tier order; the aggregate superlinear/failed/dark lists and top-scale
totals are recomputed from the merged map; every other header key
(probe/corpus/budget/methodology strings — whichever scale set wrote
them) is copied verbatim from the first partial, so the merger works
unchanged for both the sf10 decade sweep and the sf100 century sweep.
"""
import json
import sys


def main():
    out, parts = sys.argv[1], sys.argv[2:]
    queries = {}
    heap = set()
    pretouch = set()
    base = None
    for p in parts:
        with open(p) as f:
            d = json.load(f)
        if base is None:
            base = d
        heap.add(d.get("heap_gb"))
        # measurement-condition keys collect across ALL partials (like
        # heap_gb), never copy-from-first: tiers run in separate JVMs
        # and a mixed-condition merge must say so in the artifact
        pretouch.add(d.get("heap_pretouch"))
        for k, v in d["queries"].items():
            assert k not in queries, f"duplicate query {k} across tiers"
            queries[k] = v
    # identify the scale-suffixed total keys the probe wrote (e.g.
    # total_cpu_sf10 / total_cpu_sf100) so they recompute under the
    # same names
    total_keys = [k for k in base if k.startswith("total_cpu_")]
    assert len(total_keys) == 1, f"expected one total_cpu_* key: {total_keys}"
    hi = total_keys[0][len("total_cpu_"):]
    doc = {k: v for k, v in base.items()
           if not k.startswith("total_") and k not in
           ("queries", "nqueries", "superlinear", "failed", "dark",
            "heap_gb", "heap_pretouch", "per_tier_jvm")}
    doc["heap_gb"] = sorted(heap)[0] if len(heap) == 1 else sorted(heap)
    doc["heap_pretouch"] = (next(iter(pretouch)) if len(pretouch) == 1
                            else sorted(pretouch, key=str))
    doc["per_tier_jvm"] = (
        "one fresh JVM per memo tier (tools/decade_sweep.sh, load-gated "
        "< 4.0 before each tier): a single-JVM full sweep inflates late "
        "queries 5-20x in executor CPU via kernel-side fault storms that "
        "track the process's grown RSS on this memory-overcommitted host "
        "(30+ cores of guest sys-time, zero in-guest reclaim, GC/code-"
        "cache clean) — the artifact behind the r11 18-28x/decade "
        "'growth cluster' and two poisoned r12 full-sweep attempts; "
        "per-tier JVMs bound the footprint like a real cluster's "
        "per-stage executors")
    doc["nqueries"] = len(queries)
    doc["superlinear"] = [k for k, v in queries.items()
                          if v["verdict"] == "SUPER"]
    doc["failed"] = [k for k, v in queries.items()
                     if v["verdict"] == "FAILED"]
    doc["dark"] = [k for k, v in queries.items()
                   if v["verdict"] != "FAILED" and v["rows"][2] == 0]
    doc[f"total_cpu_{hi}"] = round(
        sum(v["cpu"][2] for v in queries.values()), 3)
    doc[f"total_wall_{hi}"] = round(
        sum(v["wall"][2] for v in queries.values()), 3)
    doc["queries"] = queries
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"merged {len(parts)} tiers / {len(queries)} queries -> {out}; "
          f"super={doc['superlinear']} failed={doc['failed']} "
          f"dark={doc['dark']}")


if __name__ == "__main__":
    main()
