#!/usr/bin/env python3
"""Shared runner for the SCALE_ORACLE artifacts (sf10 / sf100 slices).

Each per-scale driver (scale_oracle_sf10.py, scale_oracle_sf100.py)
supplies its query slice, its `check` prose, and a timeout; this module
owns the loop: one local_verify.py subprocess per query under a hard
timeout, resource-exhaustion and timeout recorded as infeasible-with-
reason (the SCALE_ORACLE_r10 precedent) rather than failing the
artifact. PASS entries from a prior artifact are kept on resume ONLY
when their git-rev stamp matches HEAD (ADVICE r12: a name-only resume
silently certified stale implementations — SCALE_ORACLE_sf10_r12's
winnowing_pairs/embedding_neardup PASS rows predated the width-4 and
slim-candidate rewrites); a stamp mismatch re-runs the query.
"""
import json
import subprocess
import sys
import time


def head_rev():
    """Short HEAD rev, '-dirty' when src/ or tools/ differ from it —
    the stamp a PASS entry must match to survive a resume."""
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True).stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "src", "tools"],
            capture_output=True, text=True).stdout.strip()
        return rev + ("-dirty" if dirty else "") if rev else "unknown"
    except OSError:
        return "unknown"


def trusted_revs():
    """Extra revs whose PASS stamps survive a resume, from
    GRAFT_ORACLE_TRUST_REVS (comma-separated short revs). For a
    multi-commit round where a sweep overlaps ongoing TOOLS/DOC commits:
    the caller asserts — and the artifact reader can audit via
    `git diff <rev>..HEAD -- src/main` — that no query's engine/oracle
    source changed across the trusted revs, so re-running their rows
    would only re-certify identical binaries. A rev that DID change
    query source must never be listed (that was exactly the ADVICE r12
    name-only-resume hole this stamp system exists to close)."""
    import os
    return set(filter(None,
        os.environ.get("GRAFT_ORACLE_TRUST_REVS", "").split(",")))


def run(sfdir, outdir, artifact, queries, check, timeout):
    results, infeasible, failed, stale = {}, {}, {}, {}
    rev = head_rev()
    trusted = trusted_revs()

    def rev_ok(r):
        return r == rev or r in trusted
    try:
        with open(artifact) as f:
            results = json.load(f).get("pass", {})
    except (FileNotFoundError, ValueError):
        pass

    def flush(note=None):
        # write after EVERY query: a 5400s-timeout loop that only wrote
        # at the end lost the whole slice when the round clock expired
        doc = {
            "check": check,
            "method": (f"graft.Verify dump on {sfdir} -> tools/local_verify.py "
                       f"per query (same column-sort/row-sort exact compare as "
                       f"the driver's gate), {timeout}s DuckDB timeout each"),
            "pass": results,
            "infeasible": infeasible,
            "fail": failed,
        }
        if stale:
            # resumed PASS rows whose rev no longer matches HEAD and that a
            # deadline stop prevented re-running: NOT certifications at HEAD
            # (ADVICE r13 — a stale-rev pass must never survive silently)
            doc["stale"] = stale
        if note:
            doc["note"] = note
        with open(artifact, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")

    # wall-clock stop, scoped to THIS run (ADVICE r13: the old
    # /tmp/graft_oracle_deadline file outlived its round and silently
    # truncated later runs while exiting 0). GRAFT_ORACLE_DEADLINE is an
    # absolute epoch cutoff; GRAFT_ORACLE_BUDGET a relative seconds
    # budget from loop start. No file fallback.
    import os
    t_start = time.time()
    def deadline():
        env = os.environ.get("GRAFT_ORACLE_DEADLINE")
        if env:
            try:
                return float(env)
            except ValueError:
                pass
        env = os.environ.get("GRAFT_ORACLE_BUDGET")
        if env:
            try:
                return t_start + float(env)
            except ValueError:
                pass
        return None

    def stop_deadline(q):
        # move resumed pass rows whose stamp is not HEAD out of `pass`:
        # the deadline prevented their rerun, so they certify an older rev
        for name in [n for n, row in results.items()
                     if not rev_ok(row.get("rev"))]:
            stale[name] = results.pop(name)
        unreached = [x for x in queries if x not in results
                     and x not in infeasible and x not in failed
                     and x not in stale]
        flush(f"deadline reached before: {unreached}"
              + (f"; stale-rev pass rows demoted: {sorted(stale)}" if stale else ""))
        print(f"DEADLINE reached; stopping before {q} "
              f"(failed={len(failed)}, stale={len(stale)})", flush=True)
        # a deadline stop is only clean when nothing failed (ADVICE r13:
        # sys.exit(0) here used to mask recorded hash mismatches)
        sys.exit(1 if failed else 0)

    for q in queries:
        dl = deadline()
        if dl is not None and time.time() > dl:
            stop_deadline(q)
        if q in results and rev_ok(results[q].get("rev")):
            print(f"SKIP {q}: passed at {results[q].get('rev')} "
                  f"(HEAD={rev}, {results[q]['rows']} rows)", flush=True)
            continue
        if q in results:
            print(f"RERUN {q}: prior pass stamped "
                  f"{results[q].get('rev', '<unstamped>')}, HEAD is {rev}",
                  flush=True)
            del results[q]
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "tools/local_verify.py", sfdir, outdir, q],
                capture_output=True, text=True, timeout=timeout)
            out = p.stdout.strip().splitlines()
            line = next((l for l in out if l.startswith(("PASS", "FAIL"))), "")
            secs = round(time.time() - t0, 1)
            if line.startswith(f"PASS {q} (") and "rows-only" not in line:
                rows = int(line.split("(")[1].split(" rows")[0])
                results[q] = {"rows": rows, "oracle_sec": secs, "rev": rev}
                print(f"PASS {q} rows={rows} {secs}s rev={rev}", flush=True)
            elif "No space left on device" in line or "Out of Memory" in line:
                # resource exhaustion is an ORACLE limit, not an engine
                # mismatch: DuckDB's plan spills past the box; the engine
                # side passed hash-exact at the scale below and is
                # row-band-gated at this one
                infeasible[q] = (f"DuckDB oracle exhausts local resources "
                                 f"({line.split(':')[-1].strip()[:120]}); "
                                 f"the scale-below twin is hash-exact")
                print(f"INFEASIBLE {q}: resource exhaustion ({secs}s)",
                      flush=True)
            else:
                failed[q] = {"detail": line or p.stderr[-300:],
                             "oracle_sec": secs}
                print(f"FAIL {q}: {line}", flush=True)
        except subprocess.TimeoutExpired:
            infeasible[q] = (f"DuckDB oracle exceeded {timeout}s "
                             f"(the scale-below twin passes hash-exact; "
                             f"the engine-side probe still row-gates this "
                             f"query at this scale)")
            print(f"INFEASIBLE {q}: >{timeout}s", flush=True)
        flush()
    flush()
    print(f"== {len(results)} pass, {len(failed)} fail, "
          f"{len(infeasible)} infeasible -> {artifact}")
    sys.exit(1 if failed else 0)
