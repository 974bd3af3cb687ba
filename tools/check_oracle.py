#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB over the testdata
tables and compares against the parquet dumped by graft.Verify:
columns sorted by name, rows as emitted (every query has a total ORDER BY),
values canonicalized to strings (doubles via repr, NULL as \\N).

Usage: python3 tools/check_oracle.py [sfdir] [verify_out]
(run `sbt "runMain graft.Verify <sfdir> <out>"` first)
"""
import glob
import json
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def frame(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    rows = [[canon(r[i]) for i in order] for r in rel.fetchall()]
    types = [str(rel.types[i]) for i in order]
    return names, types, rows


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    failed = []
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failed.append(name)
            continue
        try:
            on, ot, orows = frame(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            continue
        sn, st, srows = frame(con.sql(
            f"SELECT * FROM read_parquet({files!r})"))
        if sn != on:
            print(f"FAIL {name}: columns spark={sn} oracle={on}")
            failed.append(name)
            continue
        if st != ot:
            print(f"WARN {name}: types spark={st} oracle={ot}")
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            failed.append(name)
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)} row diffs; first at {i}:\n"
                  f"  spark : {a}\n  oracle: {b}")
            failed.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
