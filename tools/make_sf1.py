#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset from the read-only sf0.1 tables by
replicating each fact table 10x with disjoint key offsets (dimension
tables region/nation stay as-is). Key spaces are chosen so every join
relationship of the bench queries is preserved per replica and no
offset collides with another table's derived key arithmetic (the
supplier<->customer graph queries add 1_000_000 to custkeys, so
custkey offsets stay below that). Output: /tmp/sf1/*.parquet.

With --perturb, replica copies of documents.text and
embeddings.embedding are VARIED instead of byte-identical: exact
replication is degenerate for similarity workloads (every vector gets
10 exact clones -> the dedup tiers find trivial duplicates everywhere
and pairwise candidate mass explodes by replication^2, neither of
which real 10x data does). Perturbation is deterministic per replica:
documents get a replica-salted prefix and a frequent-letter
substitution (shifts most shingles/simhash segments), embeddings get
an element-wise nonlinear nudge (changes DIRECTION, not just norm, so
cosine/LSH signatures vary). rep 0 stays byte-identical to the source.

Measurement harness only — the engine under test never reads this
code; it just gets pointed at the directory via SPARK_GRAFT_SF_DIR.
"""
import os
import sys

import duckdb

args = [a for a in sys.argv[1:] if a != "--perturb"]
PERTURB = "--perturb" in sys.argv
SRC = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
DST = args[1] if len(args) > 1 else "/tmp/sf1"
REPS = int(args[2]) if len(args) > 2 else 10

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

# replica-perturbation expressions (rep = 0 must be the identity so one
# pristine copy of the source survives)
PERTURBED = {
    "documents": {
        "text": ("CASE WHEN rep = 0 THEN t.text ELSE "
                 "'v' || rep || ' ' || "
                 "replace(t.text, 'e', chr((97 + ((rep * 7) % 25 + 1))::INTEGER)) END"),
    },
    "embeddings": {
        "embedding": ("CASE WHEN rep = 0 THEN t.embedding ELSE "
                      "CAST(list_transform(t.embedding, x -> "
                      "CAST(x + 0.05 * rep * sin(x * 37.0 + rep) AS FLOAT))"
                      " AS FLOAT[]) END"),
    },
}

for table, offs in OFFSETS.items():
    src = f"{SRC}/{table}.parquet"
    dst = f"{DST}/{table}.parquet"
    if not os.path.exists(src):
        # trimmed sources are legitimate: a 1000x spot check of the
        # document/embedding tiers has no use for a 600M-row lineitem
        print(f"{table}: absent in {SRC}, skipped")
        continue
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    if offs is None:
        con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
    else:
        pert = PERTURBED.get(table, {}) if PERTURB else {}
        def expr(c):
            if c in offs:
                return f"t.{c} + rep * {offs[c]} AS {c}"
            if c in pert:
                return f"{pert[c]} AS {c}"
            if PERTURB and table == "documents" and c == "n_chars":
                # keep the char count honest against the perturbed text
                return f"length({pert['text']})::BIGINT AS n_chars"
            return f"t.{c}"
        sel = ", ".join(expr(c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}' t CROSS JOIN reps ORDER BY rep) "
            f"TO '{dst}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    print(f"{table}: {n} rows -> {dst}")
print("done" + (" (perturbed replicas)" if PERTURB else ""))
