#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB over the testdata
tables and compares against the parquet dumped by graft.Verify:
columns sorted by name, rows as emitted (every query has a total ORDER BY),
values canonicalized to strings (doubles via repr, NULL as \\N).

q72_cluster_dedup / q144_soft_dedup at LARGE tiers: the SQL oracles'
WITH RECURSIVE
reachability is cluster-quadratic in DuckDB's working table (>73 GB of
spill at sf1 — the r11 finding), so above CC_SQL_MAX_DOCS documents the
gate swaps the reachability CTE for an exact, linear INDEPENDENT path:
the SAME pair-CTE prefix runs in DuckDB (shingles → Jaccard >= 0.8
pairs — no Spark code involved), then a Python union-find derives the
components and each query's output shape (q72: survivor/members/count
rows; q144: per-doc cluster size + 1/size weight). Same fixpoint,
bounded memory, no per-key tolerance. The driver's own sf0.01 gate
still runs the full recursive SQL.

Usage: python3 tools/check_oracle.py [sfdir] [verify_out] [--json OUT.json]
(run `sbt "runMain graft.Verify <sfdir> <out>"` first)

--json writes a driver-shaped per-key artifact
  {key: {rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}}
(hash_match here means full canonical row equality — strictly stronger
than the driver's value hash).
"""
import glob
import json
import math
import sys

import duckdb

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.01"
OUT = ARGS[1] if len(ARGS) > 1 else "/tmp/verify_out"
JSON_OUT = None
if "--json" in sys.argv:
    JSON_OUT = sys.argv[sys.argv.index("--json") + 1]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Above this many documents, q72's recursive SQL oracle is replaced by
# the pair-prefix + union-find path (sf0.01 = 500 docs keeps the SQL
# path; sf0.1 = 5,000 and sf1 = 50,000 take the bounded one).
CC_SQL_MAX_DOCS = 2000


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


def _pair_components(con, sql, marker=",\nedges AS"):
    """Union-find components over the oracle SQL's own `pairs` CTE.

    Reuses the oracle SQL's text up to the `edges` CTE — the shingle /
    Jaccard-pair definition stays single-sourced in the SQL — and
    replays only the reachability fixpoint in Python. Returns
    {min_label: sorted members}.
    """
    if marker not in sql:
        raise RuntimeError("oracle SQL changed shape: no edges CTE marker")
    pairs = con.sql(sql.split(marker)[0] + " SELECT id1, id2 FROM pairs").fetchall()
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for node in parent:
        comps.setdefault(find(node), []).append(node)
    return comps


def cc_frame(con, sql):
    """q72's oracle via the pair CTEs + union-find (see module doc)."""
    comps = _pair_components(con, sql)
    # (survivor_id, n_members, members) ordered by survivor — the SQL's
    # GROUP BY component ORDER BY survivor_id with min-label survivors.
    out = []
    for survivor in sorted(comps):
        members = sorted(comps[survivor])
        out.append((survivor, len(members), ",".join(str(m) for m in members)))
    # Column order/types as the sorted-by-name frame() would emit them:
    # members, n_members, survivor_id.
    names = ["members", "n_members", "survivor_id"]
    types = ["VARCHAR", "BIGINT", "BIGINT"]
    rows = [[canon(m), canon(n), canon(s)] for s, n, m in out]
    return names, types, rows


def soft_dedup_frame(con, sql):
    """q144's oracle via the same pair CTEs + union-find: per-doc
    cluster size (1 outside any cluster) and the r2-rounded 1/size
    weight — the same IEEE division + floor both engines compute.
    """
    comps = _pair_components(con, sql)
    size_of = {}
    for members in comps.values():
        for m in members:
            size_of[m] = len(members)
    doc_ids = [r[0] for r in
               con.sql("SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    # Column order/types as the sorted-by-name frame() would emit them:
    # cluster_size, doc_id, weight.
    names = ["cluster_size", "doc_id", "weight"]
    types = ["BIGINT", "BIGINT", "DOUBLE"]
    rows = []
    for d in doc_ids:
        n = size_of.get(d, 1)
        w = math.floor(1.0 / n * 100 + 0.5) / 100
        rows.append([canon(n), canon(d), canon(w)])
    return names, types, rows


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    failed = []
    report = {}

    def record(name, *, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name in sorted(oracle):
        files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failed.append(name)
            record(name, rows_match=False, schema_match=False, hash_match=False,
                   spark_rows=0, oracle_rows=0, err="no spark output")
            continue
        via_py = (name in ("q72_cluster_dedup", "q144_soft_dedup")
                  and n_docs > CC_SQL_MAX_DOCS)
        try:
            if via_py:
                py_oracle = (cc_frame if name == "q72_cluster_dedup"
                             else soft_dedup_frame)
                on, ot, orows = py_oracle(con, oracle[name])
            else:
                on, ot, orows = frame(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            record(name, rows_match=False, schema_match=False, hash_match=False,
                   spark_rows=0, oracle_rows=0, err=f"oracle error {e}")
            continue
        sn, st, srows = frame(con.sql(
            f"SELECT * FROM read_parquet({files!r})"))
        tag = " (py union-find oracle)" if via_py else ""
        if sn != on:
            print(f"FAIL {name}: columns spark={sn} oracle={on}")
            failed.append(name)
            record(name, rows_match=len(srows) == len(orows), schema_match=False,
                   hash_match=False, spark_rows=len(srows),
                   oracle_rows=len(orows), err=f"columns spark={sn} oracle={on}")
            continue
        if st != ot:
            print(f"WARN {name}: types spark={st} oracle={ot}")
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            failed.append(name)
            record(name, rows_match=False, schema_match=True, hash_match=False,
                   spark_rows=len(srows), oracle_rows=len(orows), err=None)
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)} row diffs; first at {i}:\n"
                  f"  spark : {a}\n  oracle: {b}")
            failed.append(name)
            record(name, rows_match=True, schema_match=True, hash_match=False,
                   spark_rows=len(srows), oracle_rows=len(orows),
                   err=f"{len(bad)} row diffs")
        else:
            print(f"ok   {name}: {len(srows)} rows{tag}")
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(srows), oracle_rows=len(orows), err=None)
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} match")
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"wrote {JSON_OUT}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
