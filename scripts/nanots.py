#!/usr/bin/env python3
"""Rewrite a GenData events.parquet so `ts` (INT64 nanos epoch) carries
the TIMESTAMP(NANOS) logical type the driver-generated SFs use — the
Scala reader (nanosAsLong) and the DuckDB oracle then treat generated
and driver data identically. Usage: nanots.py <dir>/events.parquet"""
import sys, glob, os
import pyarrow as pa
import pyarrow.parquet as pq

path = sys.argv[1]
parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
tables = [pq.read_table(p) for p in parts]
t = pa.concat_tables(tables)
i = t.schema.get_field_index("ts")
t = t.set_column(i, "ts", t.column("ts").cast(pa.timestamp("ns")))
for p in glob.glob(os.path.join(path, "*")):
    os.remove(p)
pq.write_table(t, os.path.join(path, "part-0.parquet"))
open(os.path.join(path, "_SUCCESS"), "w").close()
print(f"rewrote {path}: {t.num_rows} rows, ts -> timestamp[ns]")
