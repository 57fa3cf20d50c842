#!/usr/bin/env python3
"""Repack GenData output to the driver's testdata layout: each table a
SINGLE parquet file (DuckDB reads these directly), every timestamp cast
to TIMESTAMP(MICROS) without a timezone — the round-5 driver layout
(rounds 1-4 used ms + a TIMESTAMP(NANOS) events.ts; Tables.events
still reads that legacy layout too). Usage: repack.py <sfdir>"""
import sys, glob, os, shutil
import pyarrow as pa
import pyarrow.parquet as pq

d = sys.argv[1]
for table_dir in sorted(glob.glob(os.path.join(d, "*.parquet"))):
    if not os.path.isdir(table_dir):
        continue
    parts = sorted(glob.glob(os.path.join(table_dir, "*.parquet")))
    t = pa.concat_tables([pq.read_table(p) for p in parts])
    name = os.path.basename(table_dir)
    # driver layout (round 5+): every timestamp is us, no timezone
    for i, f in enumerate(t.schema):
        if pa.types.is_timestamp(f.type):
            t = t.set_column(i, f.name, t.column(f.name).cast(pa.timestamp("us")))
    shutil.rmtree(table_dir)
    pq.write_table(t, table_dir)  # now a single FILE at the same path
    print(f"{name}: {t.num_rows} rows")
