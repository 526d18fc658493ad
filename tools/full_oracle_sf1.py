#!/usr/bin/env python3
"""FULL-REGISTRY DuckDB hash-exact verification at sf1 in a SINGLE
clean pass at the r15 HEAD — re-certifying the r14 sf1 ratchet
(FULL_ORACLE_sf1_r14) on the rev that carries the U3/U2 QRound sweep,
so the round's strongest correctness statement is one rev, one pass.

Usage:
  sbt "runMain graft.Verify testdata_sf1 <verifyOut>"
  python3 tools/full_oracle_sf1.py testdata_sf1 <verifyOut> FULL_ORACLE_sf1_r15.json
"""
import json
import sys

from scale_oracle_lib import run

TIMEOUT = 3600

CHECK = ("FULL-REGISTRY DuckDB hash-exact verification at sf1 (50k docs / "
         "20k vectors / 1M events) in a SINGLE pass at the r15 HEAD — "
         "every SQL-expressible registered query dumped by graft.Verify "
         "and compared per-query by tools/local_verify.py; re-certifies "
         "the r14 sf1 ratchet on the rev carrying the signed-zero and "
         "exact-boundary QRound sweep")


def main():
    sfdir, outdir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(f"{outdir}/oracle_sql.json") as f:
        registry = sorted(json.load(f).keys())
    print(f"== {len(registry)} oracled queries at {sfdir}", flush=True)
    run(sfdir, outdir, artifact, registry, CHECK, TIMEOUT)


if __name__ == "__main__":
    main()
