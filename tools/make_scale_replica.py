#!/usr/bin/env python3
"""Build a deterministic N-fold scale replica of a testdata dir for BENCH
scaling runs (NOT for correctness — the oracles always run on the driver's
own parquet).

Each fact table is unioned N times with every key column offset by
copy_index * 10_000_000, so intra-copy joins (orders->customer,
lineitem->supplier, documents<->embeddings, ...) stay consistent while the
corpus grows N-fold. Dimension tables (nation, region) are copied as-is.
Payload columns are unchanged — the replica is duplicate-heavy by
construction, which is itself a realistic (and adversarial) shape for the
dedup operators.

Usage: python3 tools/make_scale_replica.py SRC_DIR DST_DIR [N=10]
"""
import os
import sys

import duckdb
import pyarrow.compute as pc
import pyarrow as pa
import pyarrow.parquet as pq

src, dst = sys.argv[1], sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000

KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": None,  # dimensions: copy as-is
    "region": None,
}

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()


def replicate_events(sp, dp):
    """events.ts is TIMESTAMP(NANOS) in the driver's layout (the Spark
    loader reads nanos-as-long); DuckDB would rewrite it as micros, so the
    events table replicates through pyarrow with its schema intact."""
    t = pq.read_table(sp)
    for k in ("event_id", "user_id"):
        mx = pc.max(t.column(k)).as_py()
        if mx is not None and mx >= OFF:
            sys.exit(f"events.{k} max {mx} >= offset {OFF}; raise OFF")
    copies = []
    for i in range(n):
        c = t
        for k in ("event_id", "user_id"):
            idx = c.schema.get_field_index(k)
            shifted = pc.add(c.column(k), i * OFF)
            c = c.set_column(idx, k, shifted)
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, dp, use_deprecated_int96_timestamps=False,
                   coerce_timestamps=None)
    print(f"events: x{n} -> {out.num_rows} rows (pyarrow, ns timestamps)")


for t, ks in KEYS.items():
    sp, dp = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
    if not os.path.exists(sp):
        continue
    if t == "events":
        replicate_events(sp, dp)
        continue
    if ks is None:
        con.execute(f"COPY (SELECT * FROM read_parquet('{sp}')) TO '{dp}' (FORMAT PARQUET)")
        continue
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{sp}')").fetchall()]
    # the offset scheme silently corrupts join consistency if any source
    # key reaches into the next copy's range — refuse instead
    for k in ks:
        mx = con.execute(
            f"SELECT max({k}) FROM read_parquet('{sp}')").fetchone()[0]
        if mx is not None and mx >= OFF:
            sys.exit(f"{t}.{k} max {mx} >= offset {OFF}; raise OFF")
    sel = ", ".join(
        f"CAST(t.{c} + i.i * {OFF} AS BIGINT) AS {c}" if c in ks else f"t.{c}"
        for c in cols)
    con.execute(
        f"COPY (SELECT {sel} FROM read_parquet('{sp}') t, "
        f"(SELECT unnest(range({n})) AS i) i) TO '{dp}' (FORMAT PARQUET)")
    rows = con.execute(f"SELECT count(*) FROM read_parquet('{dp}')").fetchone()[0]
    print(f"{t}: x{n} -> {rows} rows")
