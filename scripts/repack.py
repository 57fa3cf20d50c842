#!/usr/bin/env python3
"""Repack GenData output to the driver's testdata layout: each table a
SINGLE parquet file (DuckDB reads these directly), every timestamp cast
to TIMESTAMP(MICROS) without a timezone — the round-5 driver layout
(rounds 1-4 used ms + a TIMESTAMP(NANOS) events.ts; Tables.events
still reads that legacy layout too). Streams part-file by part-file
into one ParquetWriter so the peak footprint is a single part, not the
whole table — the in-memory concat form OOM'd on the 600M-row sf100
lineitem. Usage: repack.py <sfdir>"""
import sys, glob, os, shutil
import pyarrow as pa
import pyarrow.parquet as pq


def us_schema(schema):
    """The same schema with every timestamp field cast to us, no tz."""
    fields = [
        f.with_type(pa.timestamp("us")) if pa.types.is_timestamp(f.type) else f
        for f in schema
    ]
    return pa.schema(fields)


d = sys.argv[1]
for table_dir in sorted(glob.glob(os.path.join(d, "*.parquet"))):
    if not os.path.isdir(table_dir):
        continue
    parts = sorted(glob.glob(os.path.join(table_dir, "*.parquet")))
    name = os.path.basename(table_dir)
    schema = us_schema(pq.read_schema(parts[0]))
    tmp = table_dir + ".repack.tmp"
    n_rows = 0
    with pq.ParquetWriter(tmp, schema) as w:
        for p in parts:
            t = pq.read_table(p).cast(schema)
            w.write_table(t)
            n_rows += t.num_rows
    shutil.rmtree(table_dir)
    os.rename(tmp, table_dir)  # now a single FILE at the same path
    print(f"{name}: {n_rows} rows")
