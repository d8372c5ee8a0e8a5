#!/usr/bin/env python3
"""Convert a tools/check.py log into a CORRECTNESS_r{N}-style JSON map
(rows/schema/hash booleans per query) so off-driver sweeps (heaps
tiers, GenSf scale tiers) leave the same artifact shape the driver
writes. PASS lines carry the row count; FAIL lines keep the reason in
`err`.

A truncated log (a check.py traceback, a killed sweep) would otherwise
convert into a smaller-but-all-green artifact that overstates coverage,
so an optional third argument pins the expected entry count: pass an
integer, or a path to an oracle_sql.json whose key count is the
expectation. The script exits nonzero when the log yields fewer
entries.

Usage: python3 tools/log2json.py <check.log> <out.json> [expected]
       expected = integer | path to oracle_sql.json
"""
import json
import os
import re
import sys


def main():
    log, out = sys.argv[1], sys.argv[2]
    expected = None
    if len(sys.argv) > 3:
        arg = sys.argv[3]
        if os.path.exists(arg):
            with open(arg) as f:
                expected = len(json.load(f))
        else:
            expected = int(arg)
    entries = {}
    with open(log) as f:
        for line in f:
            m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
            if m:
                n = int(m.group(2))
                entries[m.group(1)] = {
                    "rows_match": True, "schema_match": True,
                    "hash_match": True, "spark_rows": n,
                    "oracle_rows": n, "err": None}
                continue
            m = re.match(r"FAIL (\S+): (.*)", line)
            if m:
                entries[m.group(1)] = {
                    "rows_match": False, "schema_match": False,
                    "hash_match": False, "spark_rows": None,
                    "oracle_rows": None, "err": m.group(2).strip()}
    with open(out, "w") as f:
        json.dump(entries, f, indent=1, sort_keys=True)
    npass = sum(1 for v in entries.values() if v["hash_match"])
    print(f"{out}: {npass}/{len(entries)} pass")
    if expected is not None and len(entries) < expected:
        print(f"ERROR: log yielded {len(entries)} entries, expected "
              f"{expected} — truncated sweep, refusing to pass it off "
              f"as complete", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
