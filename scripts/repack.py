#!/usr/bin/env python3
"""Repack GenData output to the driver's testdata layout: each table a
SINGLE parquet file (DuckDB reads these directly), and events.ts cast
to TIMESTAMP(NANOS) to match the driver SFs' logical type.
Usage: repack.py <sfdir>"""
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
    if name == "events.parquet":
        i = t.schema.get_field_index("ts")
        t = t.set_column(i, "ts", t.column("ts").cast(pa.timestamp("ns")))
    shutil.rmtree(table_dir)
    pq.write_table(t, table_dir)  # now a single FILE at the same path
    print(f"{name}: {t.num_rows} rows")
