#!/usr/bin/env python3
"""Scale a testdata tier up by integer replication with remapped keys.

Usage: python3 tools/gen_sf.py [--from /root/testdata/sf0.1] \
                               [--out data/sf1] [--factor 10]

Builds a FK-consistent tier `factor` x the source tier for scale
testing (the driver's tiers are read-only; this writes under the repo's
gitignored data/ — NOT target/, where `sbt clean` deleted the round-14
tier mid-round and cost a regen + spot re-gate). Copy 0 is the
identity, so the output is a superset of the
source; copies k>0 shift every entity key by k * 10^7 on BOTH sides of
each FK, preserving join structure exactly.

Deliberate choices, each visible to the correctness gate (which runs
Spark AND DuckDB over the SAME files, so any choice here is
correctness-neutral — it only shapes the workload):

  * region/nation stay fixed (TPC-H dimension semantics).
  * documents copies get a 3-token "sfc<k> v<k> m<k>" prefix and a
    recomputed n_chars: copies are near-duplicates (Jaccard ~0.9), NOT
    exact duplicates — so exact-dedup structure is preserved per copy
    while the near-dup/LSH/span queries see genuine 10-way cross-copy
    clusters, the shape a real crawl corpus has at scale.
  * embeddings are NOT scaled (copied as-is): q46's DuckDB oracle is
    inherently all-pairs (the engine side has subquadratic variants;
    the oracle doesn't), so a 10x vector corpus would make the ORACLE
    quadratically slow, not the engine. The vector-path scale story is
    carried by the documents/text tables; tiers that need big vector
    corpora should bench the engine without the DuckDB replay.
  * events keep their timestamps (10x density per window) with
    event_id AND user_id shifted — each copy's per-user journeys are
    identical, so funnel/session semantics scale without changing
    per-user shape.
"""
import argparse
import os

import duckdb

SHIFT = 10_000_000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="data/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE TABLE copies AS SELECT unnest(range({args.factor})) AS k")

    def src(t):
        return f"'{args.src}/{t}.parquet'"

    def emit(t, sql):
        con.sql(f"COPY ({sql}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    # Dimensions: fixed.
    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM {src(t)}")
    # Vector corpus: unscaled (see module doc).
    emit("embeddings", f"SELECT * FROM {src('embeddings')}")

    emit("customer", f"""
        SELECT c_custkey + k * {SHIFT} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src('customer')}, copies""")
    emit("supplier", f"""
        SELECT s_suppkey + k * {SHIFT} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM {src('supplier')}, copies""")
    emit("part", f"""
        SELECT p_partkey + k * {SHIFT} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM {src('part')}, copies""")
    emit("orders", f"""
        SELECT o_orderkey + k * {SHIFT} AS o_orderkey,
               o_custkey + k * {SHIFT} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, copies""")
    # The source tier's (l_orderkey, l_linenumber) is NOT unique
    # (118k duplicate keys at sf0.1), so queries ordering by it are
    # only total by shared-file-order luck — luck a regenerated file's
    # different physical order breaks. Renumber linenumbers uniquely
    # per order with a deterministic full-row ordering: semantics are
    # untouched (the column is only ever projected/sorted) and every
    # ORDER BY over it becomes genuinely total.
    emit("lineitem", f"""
        SELECT l_orderkey + k * {SHIFT} AS l_orderkey,
               l_partkey + k * {SHIFT} AS l_partkey,
               l_suppkey + k * {SHIFT} AS l_suppkey,
               CAST(row_number() OVER (
                   PARTITION BY l_orderkey, k
                   ORDER BY l_linenumber, l_quantity, l_extendedprice,
                            l_partkey, l_suppkey, l_discount, l_tax,
                            l_shipdate, l_returnflag, l_linestatus)
                 AS INTEGER) AS l_linenumber,
               l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, copies""")
    emit("events", f"""
        SELECT event_id + k * {SHIFT} AS event_id, ts,
               user_id + k * {SHIFT} AS user_id,
               event_type, value, props
        FROM {src('events')}, copies""")
    emit("documents", f"""
        SELECT doc_id + k * {SHIFT} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE 'sfc' || k || ' v' || k || ' m' || k || ' ' || text
               END AS text,
               lang, source,
               CAST(length(CASE WHEN k = 0 THEN text
                    ELSE 'sfc' || k || ' v' || k || ' m' || k || ' ' || text
               END) AS BIGINT) AS n_chars
        FROM {src('documents')}, copies""")


if __name__ == "__main__":
    main()
