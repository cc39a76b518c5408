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

Fact tables are written as a DIRECTORY of n*SLICES files (one file per
copy x deterministic key-hash slice): a 100 TB corpus arrives as thousands
of files, and the dup-heavy replica compresses so well that a single-file
replica hands Spark 1-2 byte-range splits — serializing every CPU-heavy
scan stage (featurize, simhash, quality) onto 2 cores while 30 idle,
which measures the fixture, not the engine. Spark reads the directory
transparently; dimension tables stay single-file.

Usage: python3 tools/make_scale_replica.py SRC_DIR DST_DIR [N=10] [TABLES]
TABLES (optional, comma-separated) restricts the run to those tables, so
a large-N build can run one process per fact table in parallel (the
copies are independent; DuckDB serializes them inside one process).
"""
import os
import shutil
import sys

import duckdb
import pyarrow.compute as pc
import pyarrow as pa
import pyarrow.parquet as pq

src, dst = sys.argv[1], sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
OFF = 10_000_000
SLICES = 4  # files per copy; n*SLICES total, sized for ~32 local cores


def fresh_dir(dp):
    if os.path.isdir(dp):
        shutil.rmtree(dp)
    elif os.path.exists(dp):
        os.remove(dp)
    os.makedirs(dp)

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
    fresh_dir(dp)
    rows = 0
    for i in range(n):
        c = t
        for k in ("event_id", "user_id"):
            idx = c.schema.get_field_index(k)
            shifted = pc.add(c.column(k), i * OFF)
            c = c.set_column(idx, k, shifted)
        rows += c.num_rows
        # positional slices keep the source's ts clustering inside each file
        step = (c.num_rows + SLICES - 1) // SLICES
        for j in range(SLICES):
            part = c.slice(j * step, step)
            if part.num_rows:
                pq.write_table(
                    part, f"{dp}/part-{i:02d}-{j}.parquet",
                    use_deprecated_int96_timestamps=False,
                    coerce_timestamps=None)
    print(f"events: x{n} -> {rows} rows (pyarrow, ns timestamps, "
          f"{n * SLICES} files)")


for t, ks in KEYS.items():
    if only is not None and t not in only:
        continue
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
    fresh_dir(dp)
    for i in range(n):
        sel = ", ".join(
            f"CAST(t.{c} + {i * OFF} AS BIGINT) AS {c}" if c in ks else f"t.{c}"
            for c in cols)
        for j in range(SLICES):
            con.execute(
                f"COPY (SELECT {sel} FROM read_parquet('{sp}') t "
                f"WHERE hash(t.{ks[0]}) % {SLICES} = {j}) "
                f"TO '{dp}/part-{i:02d}-{j}.parquet' (FORMAT PARQUET)")
    rows = con.execute(
        f"SELECT count(*) FROM read_parquet('{dp}/*.parquet')").fetchone()[0]
    print(f"{t}: x{n} -> {rows} rows ({n * SLICES} files)")
