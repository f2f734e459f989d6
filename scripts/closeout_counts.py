#!/usr/bin/env python3
"""Mechanical close-out numbers for COVERAGE.md (r15 verdict #5: derive
them from the artifacts, never hand-count — two rounds of off-by-one).

Counts, from the artifacts themselves:
  - declared queries: len(CORRECTNESS json); if a Verify outDir is also
    given, the query dirs under it are counted INDEPENDENTLY and any
    set difference is flagged (a query that crashed before the driver
    wrote its record would otherwise silently undercount — review
    finding r16)
  - full oracle / rows-only / errors from CORRECTNESS_r{N}.json
  - test counts from the last `sbt -batch test` log, if provided

Usage: closeout_counts.py CORRECTNESS_rN.json [sbttest.log] [verify_outdir]
"""
import json
import os
import re
import sys

art = json.load(open(sys.argv[1]))
total = len(art)
full = sum(1 for v in art.values() if v.get("hash_match"))
errs = sorted(k for k, v in art.items()
              if v.get("err") not in (None, "no_oracle"))
rows_only = sorted(k for k, v in art.items()
                   if not v.get("hash_match") and v.get("err") == "no_oracle")
# an oracle that RAN and mismatched (hash_match false, err null) is a
# correctness regression, not a benign rows-only row — count it apart so
# the close-out line cannot silently absorb it (r16 advice)
failed = sorted(k for k, v in art.items()
                if v.get("hash_match") is False and v.get("err") is None)
print(f"declared queries : {total}")
print(f"full hash-match  : {full}")
print(f"rows-only        : {len(rows_only)} -> {', '.join(rows_only)}")
print(f"errors           : {len(errs)} -> {', '.join(errs) or 'none'}")
print(f"ORACLE MISMATCH  : {len(failed)} -> {', '.join(failed) or 'none'}")
if failed:
    print("  ^^ REGRESSION: these queries have an oracle and it DISAGREES")

for arg in sys.argv[2:]:
    if os.path.isdir(arg):
        dirs = sorted(d for d in os.listdir(arg)
                      if os.path.isdir(os.path.join(arg, d)))
        print(f"verify outDir    : {len(dirs)} query dirs in {arg}")
        missing = sorted(set(dirs) - set(art))
        extra = sorted(set(art) - set(dirs))
        if missing:
            print(f"  IN OUTDIR, NOT IN ARTIFACT (undercount!): {', '.join(missing)}")
        if extra:
            print(f"  IN ARTIFACT, NOT IN OUTDIR: {', '.join(extra)}")
        if not missing and not extra:
            print("  artifact and outDir agree")
    elif os.path.isfile(arg):
        # the run-level AGGREGATE is authoritative (sbt prints one
        # "Tests: ..." + "Suites: completed N" pair at the end of the
        # run); per-suite lines would double-count when both appear,
        # and hand-copying the total into prose drifted three rounds
        # running (r17 verdict #3) — emit the paste-ready line instead
        log = open(arg, errors="replace").read()
        m = re.findall(r"Tests: succeeded (\d+), failed (\d+), canceled (\d+)", log)
        suites = re.findall(r"Suites: completed (\d+), aborted (\d+)", log)
        if m:
            ok, bad, _ = (int(x) for x in m[-1])
            nsuites = int(suites[-1][0]) if suites else 0
            aborted = int(suites[-1][1]) if suites else 0
            print(f"tests            : {ok} succeeded, {bad} failed, "
                  f"{nsuites} suites ({aborted} aborted)")
            print("COVERAGE.md tests line:")
            print(f"  Tests: **{ok} succeeded, {bad} failed, {nsuites} suites**")

print("\nCOVERAGE.md line:")
print(f"  {total} declared queries: {full} full DuckDB hash-match, "
      f"{len(rows_only)} rows-only (pinned), {len(errs)} errors"
      + (f", {len(failed)} ORACLE MISMATCHES (FIX BEFORE CLOSING OUT)"
         if failed else ""))
