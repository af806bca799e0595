#!/usr/bin/env python3
"""Generate rehearsal corpora: COPIES x key-offset replication of sf0.1.

Fact tables replicate with per-copy key offsets (lineitem/orders share one
stride so their join keys stay consistent); dimension tables copy as-is.
events goes through pyarrow rather than DuckDB so the source file's exact
timestamp physical type is preserved whatever the generation (older driver
data used TIMESTAMP(NANOS), current data TIMESTAMP(MICROS);
Tables.normalizeEventTs handles both, but the rehearsal data should
exercise the same type the driver ships).

FILE GEOMETRY (round 9): each fact table is written as a DIRECTORY of
per-copy part files — `{table}.parquet/part-00000.parquet` ... — the shape
a real 100 TB table actually has. The previous single-file layout forced a
trade-off that broke at scale: tiny (20k-row) row groups bought scan
parallelism at sf1 but made the ONE footer grow linearly with SF (sf100's
lineitem: 29,300 row groups, a 27 MB footer re-parsed by every byte-range
split — footer work quadratic in SF, measured as q01 3.4 s @ sf10 ->
582 s @ sf100). Per-copy files bound every footer to the source-table
group count, give file-level parallelism that GROWS with SF, and rehearse
many-file listing (the k16/k19 path). Row groups stay 20k INSIDE each
small file so a low maxPartitionBytes can still split within a file at
small SF.

The replicated corpus is deliberately adversarial for dedup: every doc/
embedding exists COPIES x verbatim — the high-dup regime a crawl corpus
shows.
"""
import os
import shutil
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("GRAFT_SF_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("GRAFT_SF_DST", "/tmp/sf1")
COPIES = int(os.environ.get("GRAFT_SF_COPIES", "10"))
# GRAFT_SF_SKEW=1: power-law key mode — the sf ladder replicates
# uniformly, which never exercises the hot-key paths (salting, the
# funnel's hot user, LSH's hot band). Skew mode plants, at EVERY scale:
#  - a hot JOIN key: ~10% of lineitem rows point at l_orderkey=1
#    (q22's salted join, and any orders join, sees one 10%-mass key);
#  - a hot USER: ~10% of events belong to user_id=1 (q44/q46 and the
#    st26/st27 streaming twins carry one power-law user);
#  - a hot TEXT/BAND: ~10% of documents share ONE verbatim text (every
#    minhash band of it collides into one bucket — d02/d14's
#    exact-dup pre-collapse and banding must absorb it).
SKEW = os.environ.get("GRAFT_SF_SKEW", "0") == "1"
HOT_TEXT = ("the quick brown fox jumps over the lazy dog while the "
            "hot bucket fills with ten percent of the corpus and the "
            "band join must not go quadratic on it ") * 4

os.makedirs(DST, exist_ok=True)

con = duckdb.connect()
stride = con.sql(f"SELECT MAX(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0]
dc = con.sql(f"SELECT MAX(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]
vc = con.sql(f"SELECT MAX(vec_id)+1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]

def rep(table, key, k, key_sql=None, extra_sql=""):
    d = f"{DST}/{table}.parquet"
    if os.path.exists(d) and not os.path.isdir(d):
        os.remove(d)
    os.makedirs(d, exist_ok=True)
    for i in range(COPIES):
        ksql = (key_sql or "{key} + {off}").format(key=key, off=i * k)
        con.sql(
            f"COPY (SELECT {ksql} AS {key}, {extra_sql}"
            f"* EXCLUDE ({key}{', text' if extra_sql else ''}) "
            f"FROM '{SRC}/{table}.parquet') "
            f"TO '{d}/part-{i:05d}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 20000)")

if SKEW:
    # hot join key: every 10th source orderkey collapses to key 1 in
    # every copy (orders keeps unique keys, so the join itself stays
    # valid — the PROBE side is what's skewed)
    rep("lineitem", "l_orderkey", stride,
        key_sql="CASE WHEN {key} % 10 = 0 THEN 1 ELSE {key} + {off} END")
    rep("documents", "doc_id", dc,
        extra_sql=("CASE WHEN doc_id % 10 = 0 THEN '" + HOT_TEXT +
                   "' ELSE text END AS text, "))
else:
    rep("lineitem", "l_orderkey", stride)
    rep("documents", "doc_id", dc)
rep("orders", "o_orderkey", stride)
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
ev_dir = f"{DST}/events.parquet"
if os.path.exists(ev_dir) and not os.path.isdir(ev_dir):
    os.remove(ev_dir)
os.makedirs(ev_dir, exist_ok=True)
if SKEW:
    # hot user: every 10th event (by source event_id) belongs to user 1
    # in every copy — ONE user carries ~10% of the whole corpus
    pc = pa.compute
    eid = src.column("event_id")
    mod10 = pc.subtract(eid, pc.multiply(pc.divide(eid, 10), 10))
    hot = pc.equal(mod10, 0)
    uid_idx = src.schema.get_field_index("user_id")
    src = src.set_column(
        uid_idx, "user_id",
        pc.if_else(hot, pa.scalar(1, pa.int64()), src.column("user_id")))
for i in range(COPIES):
    t = src.set_column(src.schema.get_field_index("event_id"), "event_id",
                       pa.compute.add(src.column("event_id"), i * ev))
    shifted = pa.compute.add(
        t.column("ts").cast(pa.int64()),
        i * span_us).cast(pa.timestamp("us"))
    pq.write_table(t.set_column(ts_idx, "ts", shifted),
                   f"{ev_dir}/part-{i:05d}.parquet",
                   row_group_size=100000)

for t in ["customer", "supplier", "part", "nation", "region"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
print(f"{COPIES}x corpus written to", DST)
