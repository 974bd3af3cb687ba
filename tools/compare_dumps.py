#!/usr/bin/env python3
"""Parallelism-independence audit: diff two graft.Verify dump dirs.

Every registry query must produce the SAME canonical frame regardless
of the execution profile (master thread count, shuffle-partition
count): columns sorted by name, rows in emitted order (every query
ends in a total ORDER BY), doubles compared by repr — the same
canonicalization as tools/check_oracle.py. Run graft.Verify twice with
different SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE and point this at the
two output dirs:

    python3 tools/compare_dumps.py /tmp/verify_base /tmp/verify_p3

Exit 0 iff every key present in either dir matches exactly.
"""
import glob
import math
import os
import sys

import duckdb


def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def frame(con, dump_dir, key):
    rel = con.sql(f"SELECT * FROM '{dump_dir}/{key}/*.parquet'")
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    types = [str(rel.types[i]) for i in order]
    rows = [[canon(r[i]) for i in order] for r in rel.fetchall()]
    return names, types, rows


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    keys = sorted(
        {os.path.basename(p) for d in (a_dir, b_dir)
         for p in glob.glob(f"{d}/q*") if os.path.isdir(p)})
    con = duckdb.connect()
    bad = 0
    for key in keys:
        if not os.path.isdir(f"{a_dir}/{key}"):
            print(f"FAIL {key}: missing in {a_dir}")
            bad += 1
            continue
        if not os.path.isdir(f"{b_dir}/{key}"):
            print(f"FAIL {key}: missing in {b_dir}")
            bad += 1
            continue
        an, at, ar = frame(con, a_dir, key)
        bn, bt, br = frame(con, b_dir, key)
        if an != bn or at != bt:
            print(f"FAIL {key}: schema {an}/{at} vs {bn}/{bt}")
            bad += 1
        elif ar != br:
            diffs = [i for i, (x, y) in enumerate(zip(ar, br)) if x != y]
            where = (f"first row diff at {diffs[0]}: {ar[diffs[0]]} vs "
                     f"{br[diffs[0]]}") if diffs else \
                f"row count {len(ar)} vs {len(br)}"
            print(f"FAIL {key}: {where}")
            bad += 1
        else:
            print(f"ok   {key}: {len(ar)} rows")
    print(f"\n{len(keys) - bad}/{len(keys)} byte-identical")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
