#!/usr/bin/env python3
"""DuckDB arm of the q27b rsd-cost curve (r13 verdict task #3):
time approx_count_distinct (fixed-precision sketch, no rsd dial) and
the exact count over the same parquet, 3-run medians, plus the
sketch's per-flag relative error. Strictly local tooling.

Usage: q27b_duckdb.py <sfDir>
"""
import statistics
import sys
import time

import duckdb

sf = sys.argv[1]
con = duckdb.connect()
li = f"read_parquet('{sf}/lineitem.parquet')"

APPROX = f"""SELECT l_returnflag,
  approx_count_distinct(l_partkey) AS approx_ndp
  FROM {li} GROUP BY l_returnflag ORDER BY l_returnflag"""
EXACT = f"""SELECT l_returnflag,
  count(DISTINCT l_partkey) AS exact_ndp
  FROM {li} GROUP BY l_returnflag ORDER BY l_returnflag"""


def median3(q):
    con.execute(q).fetchall()  # warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        con.execute(q).fetchall()
        ts.append(time.time() - t0)
    return statistics.median(ts), sorted(ts)


exact = dict(con.execute(EXACT).fetchall())
print("exact ndp per flag:", exact)
m, ts = median3(APPROX)
est = dict(con.execute(APPROX).fetchall())
errs = {f: f"{abs(est[f] - e) / e * 100:.3f}%" for f, e in exact.items()}
print(f"== duckdb approx  median {m:.3f} s  ({ts})  errors={errs}")
m, ts = median3(EXACT)
print(f"== duckdb exact   median {m:.3f} s  ({ts})")
