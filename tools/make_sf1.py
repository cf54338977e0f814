#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset from the read-only sf0.1 tables by
replicating each fact table 10x with disjoint key offsets (dimension
tables region/nation stay as-is). Key spaces are chosen so every join
relationship of the bench queries is preserved per replica and no
offset collides with another table's derived key arithmetic (the
supplier<->customer graph queries add 1_000_000 to custkeys, so
custkey offsets stay below that). Output: /tmp/sf1/*.parquet.

Measurement harness only — the engine under test never reads this
code; it just gets pointed at the directory via SPARK_GRAFT_SF_DIR.
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE TABLE reps AS SELECT range AS rep FROM range({REPS})")

# per-table key-offset expressions; non-key columns ride along
OFFSETS = {
    "region": None,          # dimension: copy as-is
    "nation": None,          # dimension: copy as-is
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 100_000,
                 "l_suppkey": 10_000},
    "events": {"event_id": 10_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}

for table, offs in OFFSETS.items():
    src = f"{SRC}/{table}.parquet"
    dst = f"{DST}/{table}.parquet"
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    if offs is None:
        con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
    else:
        sel = ", ".join(
            f"t.{c} + rep * {offs[c]} AS {c}" if c in offs else f"t.{c}"
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}' t CROSS JOIN reps ORDER BY rep) "
            f"TO '{dst}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    print(f"{table}: {n} rows -> {dst}")
print("done")
