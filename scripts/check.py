#!/usr/bin/env python3
"""Local driver-mimic correctness check (dev tool, NOT part of the library).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify"`,
run  `python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify`.

Mirrors what the driver does: registers the sf parquet tables in DuckDB,
runs each oracle_sql.json entry, and compares against the Spark parquet
dump (columns sorted by name, rows sorted, values hashed).
"""
import sys, json, glob, os, threading
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
# optional: 4th arg = per-oracle DuckDB timeout (sec); 3rd = name filter
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and sys.argv[3] else None
timeout = float(sys.argv[4]) if len(sys.argv) > 4 else None
con = duckdb.connect()


def run_oracle(sql):
    """Execute with an optional wall-clock cap (con.interrupt() from a
    watchdog thread) — some exact-replay oracles (recursive CTEs over
    1M rows) price out of DuckDB at sf1; a timeout records that honestly
    instead of hanging the sweep."""
    if timeout is None:
        return con.execute(sql).df()
    timer = threading.Timer(timeout, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).df()
    finally:
        timer.cancel()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")


def a4_iterative():
    """a4's recursive-CTE oracle replayed as a linear fold (r9, VERDICT
    r8 item 2): DuckDB re-joins the full events frame against the CTE's
    working table on EVERY iteration — O(rows²/keys) — and prices out at
    sf1 (500k events, the sweep's one honest timeout). The recurrence is
    a fold, not a join: the baseline stats (decimal-exact sums), join,
    and per-key event ordering stay in DuckDB, and the reset-on-alarm
    CUSUM runs as a plain Python loop. Still fully Spark-independent,
    and proven equal to the recursive CTE by both matching the same
    Spark dumps at sf0.01/sf0.1 (where the CTE still completes)."""
    base = con.execute("""
      WITH st AS (SELECT event_type AS key, COUNT(*) AS n,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s1,
        CAST(CAST(SUM(CAST(value * value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS s2
       FROM events GROUP BY event_type),
      sx AS (SELECT key, s1 / n AS mean, sqrt((s2 - s1 * s1 / n) / n) AS sd
             FROM st)
      SELECT e.event_id, sx.key, e.value, sx.mean, sx.sd
      FROM events e JOIN sx ON e.event_type = sx.key
      ORDER BY sx.key, epoch(date_trunc('second', e.ts)), e.event_id
    """).fetchall()
    rows = []
    cur = None
    pos = neg = 0.0
    for event_id, key, value, mean, sd in base:
        if key != cur:
            cur, pos, neg = key, 0.0, 0.0
        # the CTE applies the reset to the PREVIOUS row's statistic when
        # that row alarmed, before accumulating the current reading
        if sd > 0 and pos > 5.0 * sd:
            pos = 0.0
        if sd > 0 and neg < -(5.0 * sd):
            neg = 0.0
        pos = max(0.0, pos + (value - mean - 0.5 * sd))
        neg = min(0.0, neg + (value - mean + 0.5 * sd))
        if sd > 0 and pos > 5.0 * sd:  # round-half-even, like round_even
            rows.append((event_id, key, value, "up",
                         round(pos / sd * 1000000) / 1000000))
        if sd > 0 and neg < -(5.0 * sd):
            rows.append((event_id, key, value, "down",
                         round(-neg / sd * 1000000) / 1000000))
    return pd.DataFrame(rows,
                        columns=["event_id", "key", "value", "side", "stat"])

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
n_ok = n_bad = n_to = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output")
        n_bad += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)])
    try:
        exp = a4_iterative() if name == "a4_cusum_drift" else run_oracle(sql)
    except duckdb.InterruptException:
        print(f"TIMEOUT {name}: oracle exceeded {timeout}s in duckdb")
        n_to += 1
        continue
    except Exception as ex:
        if "INTERRUPT" in str(ex).upper():
            print(f"TIMEOUT {name}: oracle exceeded {timeout}s in duckdb")
            n_to += 1
            continue
        print(f"FAIL {name}: duckdb error: {ex}")
        n_bad += 1
        continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} vs {ec}")
        n_bad += 1
        continue
    got, exp = got[gc], exp[gc]
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        n_bad += 1
        continue
    g = got.sort_values(gc).reset_index(drop=True)
    e = exp.sort_values(gc).reset_index(drop=True)
    mismatch = []
    for c in gc:
        gv, ev = g[c], e[c]
        if str(gv.dtype) != str(ev.dtype):
            mismatch.append(f"{c}: dtype {gv.dtype} vs {ev.dtype}")
        if not gv.equals(ev.astype(gv.dtype, errors="ignore") if str(gv.dtype) != str(ev.dtype) else ev):
            try:
                diff = (gv != ev) & ~(gv.isna() & ev.isna())
                idx = diff[diff].index[:3].tolist()
                mismatch.append(f"{c}: {len(diff[diff])} diffs e.g. idx {idx} got {gv.iloc[idx].tolist() if idx else []} exp {ev.iloc[idx].tolist() if idx else []}")
            except Exception:
                mismatch.append(f"{c}: unequal")
    if mismatch:
        print(f"FAIL {name}: " + "; ".join(mismatch))
        n_bad += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
        n_ok += 1
print(f"== {n_ok} ok, {n_bad} bad, {n_to} timeout ==")
sys.exit(1 if n_bad else 0)
