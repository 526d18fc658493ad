#!/usr/bin/env python3
"""Compare a fresh bench_out.json against a recorded round artifact.

Usage: python3 tools/bench_compare.py [bench_out.json] [BENCH_r07.json ...]

The recorded BENCH_r{N}.json files wrap the payload under `parsed` and
keep only the last 2000 chars of stdout in `tail`, so the reference
per-query map is reassembled from BOTH: every `"name":float` pair that
survives in the tail plus the parsed compact map (15 slowest). For each
query present in both runs the script reports the ratio new/old and
flags anything past the 30% honesty gate, so a BASELINE.md claim of
"no >30% regressions" is a mechanical check, not an eyeball.
"""
import json
import re
import sys


def ref_map(path):
    with open(path) as f:
        d = json.load(f)
    out = {}
    tail = d.get("tail") or ""
    for name, val in re.findall(r'"([a-z0-9_]+)":(-?\d+\.\d+)', tail):
        if name not in ("value",):
            out[name] = float(val)
    parsed = d.get("parsed") or {}
    for name, val in (parsed.get("queries") or {}).items():
        out[name] = float(val)
    out.pop("sf", None)
    return out


def main():
    args = sys.argv[1:]
    new_path = args[0] if args else "bench_out.json"
    ref_paths = args[1:] or ["BENCH_r07.json"]
    with open(new_path) as f:
        new = json.load(f)["queries"]
    ref = {}
    for p in ref_paths:
        ref.update(ref_map(p))

    both = sorted(set(new) & set(ref))
    slower, faster = [], []
    for q in both:
        if ref[q] <= 0 or new[q] <= 0:
            continue
        r = new[q] / ref[q]
        if r > 1.30:
            slower.append((q, ref[q], new[q], r))
        elif r < 0.70:
            faster.append((q, ref[q], new[q], r))
    print(f"compared {len(both)} queries (new={len(new)}, ref={len(ref)})")
    print(f"total new: {sum(v for v in new.values() if v > 0):.1f}s  "
          f"ref(partial): {sum(ref[q] for q in both):.1f}s over shared set")
    for tag, rows in (("SLOWER >30%", slower), ("faster >30%", faster)):
        print(f"-- {tag}: {len(rows)}")
        for q, a, b, r in sorted(rows, key=lambda x: -x[3]):
            print(f"   {q:32s} {a:7.3f}s -> {b:7.3f}s  x{r:.2f}")
    missing = sorted(set(ref) - set(new))
    if missing:
        print(f"-- in ref but not new: {missing}")
    sys.exit(1 if slower else 0)


if __name__ == "__main__":
    main()
