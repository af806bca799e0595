#!/usr/bin/env python3
"""Generate /tmp/sf1 rehearsal data: 10x key-offset replication of sf0.1.

Fact tables replicate with per-copy key offsets (lineitem/orders share one
stride so their join keys stay consistent); dimension tables copy as-is.
events goes through pyarrow rather than DuckDB so the source file's exact
timestamp physical type is preserved whatever the generation (older driver
data used TIMESTAMP(NANOS), current data TIMESTAMP(MICROS);
Tables.normalizeEventTs handles both, but the rehearsal data should
exercise the same type the driver ships).

The replicated corpus is deliberately adversarial for dedup: every doc/
embedding exists 10x verbatim — the high-dup regime a crawl corpus shows.
"""
import shutil
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = __import__("os").environ.get("GRAFT_SF_SRC", "/root/testdata/sf0.1")
DST = __import__("os").environ.get("GRAFT_SF_DST", "/tmp/sf1")
COPIES = int(__import__("os").environ.get("GRAFT_SF_COPIES", "10"))

__import__("os").makedirs(DST, exist_ok=True)

con = duckdb.connect()
stride = con.sql(f"SELECT MAX(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0]
dc = con.sql(f"SELECT MAX(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]
vc = con.sql(f"SELECT MAX(vec_id)+1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]

def rep(table, key, k):
    sels = " UNION ALL ".join(
        f"SELECT {key} + {i*k} AS {key}, * EXCLUDE ({key}) FROM '{SRC}/{table}.parquet'"
        for i in range(COPIES))
    # bounded row groups: a real 100 TB table is many files/row groups, so
    # Spark's scan parallelism is a given; DuckDB's default (~122k rows per
    # group) leaves a 500k-row rehearsal file with ~4 groups, which caps
    # the scan at 4 partitions and serializes per-row kernels behind a few
    # cores — unrepresentative of the scale this rehearses
    con.sql(f"COPY ({sels}) TO '{DST}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 20000)")

rep("lineitem", "l_orderkey", stride)
rep("orders", "o_orderkey", stride)
rep("documents", "doc_id", dc)
rep("embeddings", "vec_id", vc)

src = pq.read_table(f"{SRC}/events.parquet")
ev = con.sql(f"SELECT MAX(event_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
# TIME-EXTENDED replication (round 9): copy i shifts ts by i full spans,
# so the rehearsal corpus covers COPIES x the time range at the SOURCE's
# per-window density — a 10x-bigger corpus of MORE time, which is what a
# real fact table grows into. The old same-timestamp replication made
# every interval/window 10x denser, so q39/st04/st19's join outputs grew
# quadratically with SF — a rehearsal artifact, not an operator property.
# event_id still offsets per copy (identity keys stay unique).
span_us = con.sql(
    f"SELECT CAST(date_diff('microseconds', MIN(ts), MAX(ts)) + 3600000000"
    f" AS BIGINT) FROM '{SRC}/events.parquet'").fetchone()[0]
ts_idx = src.schema.get_field_index("ts")
parts = []
for i in range(COPIES):
    t = src.set_column(src.schema.get_field_index("event_id"), "event_id",
                       pa.compute.add(src.column("event_id"), i * ev))
    shifted = pa.compute.add(
        t.column("ts").cast(pa.int64()),
        i * span_us).cast(pa.timestamp("us"))
    parts.append(t.set_column(ts_idx, "ts", shifted))
pq.write_table(pa.concat_tables(parts), f"{DST}/events.parquet",
               row_group_size=100000)

for t in ["customer", "supplier", "part", "nation", "region"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
print("sf1 written to", DST)
