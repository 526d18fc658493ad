#!/usr/bin/env python3
"""Merge per-query ISOLATED decade re-measures into a SCALE_sf10 artifact.

Usage: merge_isolated.py <artifact.json> <note-json> <iso.json:query> ...

Each iso.json is a single-target DecadeProbe artifact produced in a FRESH
96 GiB-heap JVM (plus the target's build prefix, unreported); the named
query's entry is copied into the artifact's top-level "isolated" map —
the committed evidence VERDICT r11 item 1 asked for. <note-json> is a
JSON object mapping query -> one-line root-cause/verdict note, stored
alongside the numbers.
"""
import json
import sys


def main():
    artifact, notes_path = sys.argv[1], sys.argv[2]
    with open(artifact) as f:
        doc = json.load(f)
    with open(notes_path) as f:
        notes = json.load(f)
    iso = {}
    for spec in sys.argv[3:]:
        path, query = spec.rsplit(":", 1)
        with open(path) as f:
            sub = json.load(f)
        entry = sub["queries"][query]
        entry["heap_gb"] = sub.get("heap_gb")
        if query in notes:
            entry["note"] = notes[query]
        iso[query] = entry
    doc["isolated"] = iso
    doc["isolated_method"] = (
        "each query re-measured in a FRESH JVM (SPARK_DRIVER_MEM=96g — heap "
        "scaled to the corpus, the r11 precedent) at all three scales, with "
        "only its memo-build prefix run first; numbers are therefore free of "
        "the shared-sweep's resident-checkpoint heap pressure")
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"merged {len(iso)} isolated entries into {artifact}")


if __name__ == "__main__":
    main()
