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

Gate metric: executor CPU first, wall second. Wall timings on this
host carry a documented 1.5-10x ambient co-tenancy error bar; CPU does
not. When both files carry a `queries_cpu` map (bench_out.json and
BENCH_PIN artifacts from round 11 on), a query only FAILS the gate on
cpu_ratio > 1.30 — wall-only drift is reported as informational.
Against an older wall-only reference the gate falls back to wall.
"""
import json
import re
import sys


def tail_objects(tail, key):
    """Extract the {...} object following '"key":' in the tail, if the
    whole object survived truncation. The bench line is one flat JSON
    object whose per-query maps contain no nesting, so scanning to the
    first '}' after the anchor is exact. A flat key:value regex over
    the whole tail cannot tell `queries` (wall) from `queries_cpu`
    entries and lets cpu values overwrite wall — hence the anchor."""
    out = {}
    anchor = f'"{key}":{{'
    i = tail.find(anchor)
    if i < 0:
        return out
    j = tail.find("}", i)
    if j < 0:
        return out
    for name, val in re.findall(r'"([a-z0-9_]+)":(-?\d+(?:\.\d+)?)',
                                tail[i + len(anchor):j]):
        out[name] = float(val)
    return out


def ref_maps(path):
    """(wall map, cpu map) — cpu empty for pre-r11 artifacts."""
    with open(path) as f:
        d = json.load(f)
    wall, cpu = {}, {}
    # BENCH_PIN files may be a raw bench_out payload, not driver-wrapped
    payload = d if "queries" in d else (d.get("parsed") or {})
    tail = d.get("tail") or ""
    # Prefer the full JSON line if it survived in the tail (it is
    # written as one line starting at the last '{"metric"').
    start = tail.rfind('{"metric"')
    if start >= 0:
        try:
            full = json.loads(tail[start:].strip().splitlines()[0])
            wall.update({k: float(v) for k, v in (full.get("queries") or {}).items()})
            cpu.update({k: float(v) for k, v in (full.get("queries_cpu") or {}).items()})
        except (ValueError, TypeError, AttributeError):
            start = -1
    if start < 0:
        # truncated tail: recover what survives, with each map anchored
        # to its own object so cpu entries can never populate wall
        wall.update(tail_objects(tail, "queries"))
        cpu.update(tail_objects(tail, "queries_cpu"))
    for name, val in (payload.get("queries") or {}).items():
        wall[name] = float(val)
    for name, val in (payload.get("queries_cpu") or {}).items():
        cpu[name] = float(val)
    wall.pop("sf", None)
    return wall, cpu, payload.get("cpus")


def main():
    args = sys.argv[1:]
    new_path = args[0] if args else "bench_out.json"
    ref_paths = args[1:] or ["BENCH_r07.json"]
    with open(new_path) as f:
        d = json.load(f)
    new = d["queries"]
    new_cpu = d.get("queries_cpu") or {}
    ref, ref_cpu = {}, {}
    for p in ref_paths:
        w, c, ref_cpus = ref_maps(p)
        ref.update(w)
        ref_cpu.update(c)
        # the SAME binary at local[32] burns ~4x the aggregate executor
        # CPU of local[4] on sf0.1 micro-tasks (32-way contention): a
        # cross-config comparison is meaningless, refuse it loudly
        new_cpus = d.get("cpus")
        if new_cpus is not None and ref_cpus is not None and new_cpus != ref_cpus:
            sys.exit(f"CONFIG MISMATCH: {new_path} ran local[{new_cpus}] but {p} "
                     f"ran local[{ref_cpus}] — same-binary CPU differs ~4x across "
                     f"thread configs; re-run one side to match")

    both = sorted(set(new) & set(ref))
    gated = sorted(set(new_cpu) & set(ref_cpu) & set(both))
    slower, faster, wall_drift = [], [], []
    for q in both:
        if ref[q] <= 0 or new[q] <= 0:
            continue
        wr = new[q] / ref[q]
        if q in gated and ref_cpu[q] > 0 and new_cpu[q] > 0:
            cr = new_cpu[q] / ref_cpu[q]
            if cr > 1.30:
                slower.append((q, ref_cpu[q], new_cpu[q], cr, "cpu"))
            elif wr > 1.30:
                wall_drift.append((q, ref[q], new[q], wr, "wall"))
            elif cr < 0.70:
                faster.append((q, ref_cpu[q], new_cpu[q], cr, "cpu"))
        else:
            if wr > 1.30:
                slower.append((q, ref[q], new[q], wr, "wall"))
            elif wr < 0.70:
                faster.append((q, ref[q], new[q], wr, "wall"))
    print(f"compared {len(both)} queries (new={len(new)}, ref={len(ref)}, "
          f"cpu-gated={len(gated)})")
    print(f"total new: {sum(v for v in new.values() if v > 0):.1f}s wall"
          + (f" / {sum(v for v in new_cpu.values() if v > 0):.1f}s cpu"
             if new_cpu else "")
          + f"  ref(partial): {sum(ref[q] for q in both):.1f}s wall over shared set")
    for tag, rows in (("SLOWER >30% (gate)", slower),
                      ("wall-only drift >30% (info, cpu within gate)", wall_drift),
                      ("faster >30%", faster)):
        print(f"-- {tag}: {len(rows)}")
        for q, a, b, r, m in sorted(rows, key=lambda x: -x[3]):
            print(f"   {q:32s} {a:7.3f}s -> {b:7.3f}s  x{r:.2f} ({m})")
    missing = sorted(set(ref) - set(new))
    if missing:
        print(f"-- in ref but not new: {missing}")
    sys.exit(1 if slower else 0)


if __name__ == "__main__":
    main()
