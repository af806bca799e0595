#!/usr/bin/env python3
"""Generate the recorded integration fixtures (round 11, VERDICT item 3).

The sandbox has no egress, so the two env-gated integration mains
(integration/RealPortalIngest, RealClickHouseRoundtrip) have never run
against a live endpoint. What CAN be pinned offline is the byte level:
this script produces wire payloads with INDEPENDENT implementations —
pyarrow for Arrow IPC stream pages (the same stack the reference's
hypersync/SQD portals serve through), and a from-the-spec Python
RowBinary packer (clickhouse.com/docs/interfaces/formats#rowbinary) —
and commits them as test resources. FixtureReplaySpec then drives the
REAL client paths over these foreign bytes:

 - the Arrow pages are served by a loopback HTTP server and ingested by
   the arrow-http DataSource end to end (paging cursor, multi-batch
   streams, vector decode), so a codec produced by a different Arrow
   implementation than the one the source embeds is what gets decoded;
 - the RowBinary fixture is decoded by the sink's codec layer AND
   re-encoded, pinned byte-identical — any drift from the public format
   breaks loudly against bytes our own encoder did not produce.

Deterministic row rules (row i of 48, shared by both fixtures):
  event_id   = i                         (the block number)
  ts         = 1700000000000000 + i*1e6  (epoch micros, UTC)
  user_id    = NULL if i % 7 == 3 else 1000 + (i * 37) % 97
  event_type = [view, click, purchase, signup, error][i % 5]
  value      = i * 1.5 + 0.25
  props      = NULL if i % 13 == 6 else '{"k":i}'

Arrow pages: 3 IPC streams of 16 rows (blocks 0-15, 16-31, 32-47);
page 0 is written as TWO record batches (8+8) so the reader's
loadNextBatch loop is exercised within one page.
"""
import json
import os
import struct

import pyarrow as pa
import pyarrow.ipc as ipc

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")
os.makedirs(OUT, exist_ok=True)

N = 48
TYPES = ["view", "click", "purchase", "signup", "error"]
T0 = 1700000000000000


def row(i):
    return dict(
        event_id=i,
        ts=T0 + i * 1000000,
        user_id=None if i % 7 == 3 else 1000 + (i * 37) % 97,
        event_type=TYPES[i % 5],
        value=i * 1.5 + 0.25,
        props=None if i % 13 == 6 else '{"k":%d}' % i,
    )


ROWS = [row(i) for i in range(N)]

# ---- Arrow IPC stream pages (pyarrow implementation) ----
SCHEMA = pa.schema([
    pa.field("event_id", pa.int64(), nullable=False),
    pa.field("ts", pa.timestamp("us", tz="UTC"), nullable=True),
    pa.field("user_id", pa.int64(), nullable=True),
    pa.field("event_type", pa.string(), nullable=True),
    pa.field("value", pa.float64(), nullable=True),
    pa.field("props", pa.string(), nullable=True),
])


def batch(rows):
    return pa.record_batch(
        [pa.array([r["event_id"] for r in rows], pa.int64()),
         pa.array([r["ts"] for r in rows], pa.timestamp("us", tz="UTC")),
         pa.array([r["user_id"] for r in rows], pa.int64()),
         pa.array([r["event_type"] for r in rows], pa.string()),
         pa.array([r["value"] for r in rows], pa.float64()),
         pa.array([r["props"] for r in rows], pa.string())],
        schema=SCHEMA)


for p in range(3):
    page = ROWS[p * 16:(p + 1) * 16]
    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, SCHEMA) as w:
        if p == 0:  # two batches in page 0: exercise loadNextBatch
            w.write_batch(batch(page[:8]))
            w.write_batch(batch(page[8:]))
        else:
            w.write_batch(batch(page))
    path = os.path.join(OUT, f"portal_page_{p}.arrows")
    with open(path, "wb") as f:
        f.write(sink.getvalue().to_pybytes())
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")

# ---- RowBinary fixture (independent from-the-spec packer) ----
# column order + ClickHouse types (must match manifest + spec):
CH_TYPES = [("event_id", "UInt64"), ("ts", "DateTime64(6)"),
            ("user_id", "Nullable(Int64)"), ("event_type", "String"),
            ("value", "Float64"), ("props", "Nullable(String)")]


def leb128(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def pack_row(r):
    out = struct.pack("<Q", r["event_id"])
    out += struct.pack("<q", r["ts"])  # DateTime64(6) = Int64 micros
    if r["user_id"] is None:
        out += b"\x01"
    else:
        out += b"\x00" + struct.pack("<q", r["user_id"])
    et = r["event_type"].encode()
    out += leb128(len(et)) + et
    out += struct.pack("<d", r["value"])
    if r["props"] is None:
        out += b"\x01"
    else:
        pr = r["props"].encode()
        out += b"\x00" + leb128(len(pr)) + pr
    return out


rb = b"".join(pack_row(r) for r in ROWS)
rb_path = os.path.join(OUT, "clickhouse_rows.rowbinary")
with open(rb_path, "wb") as f:
    f.write(rb)
print(f"wrote {rb_path} ({len(rb)} bytes)")

manifest = dict(
    n_rows=N,
    arrow_pages=["portal_page_0.arrows", "portal_page_1.arrows",
                 "portal_page_2.arrows"],
    arrow_page_blocks=[[0, 16], [16, 32], [32, 48]],
    rowbinary="clickhouse_rows.rowbinary",
    rowbinary_columns=[list(c) for c in CH_TYPES],
    t0_micros=T0,
    sum_event_id=sum(r["event_id"] for r in ROWS),
    sum_user_id=sum(r["user_id"] for r in ROWS if r["user_id"] is not None),
    n_null_user_id=sum(1 for r in ROWS if r["user_id"] is None),
    n_null_props=sum(1 for r in ROWS if r["props"] is None),
)
with open(os.path.join(OUT, "manifest.json"), "w") as f:
    json.dump(manifest, f, indent=1)
print("wrote manifest.json:", manifest)
