#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each <outDir>/<name> parquet written by graft.Verify, replays the
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same sf dir,
then compares: columns sorted by name, rows sorted by all columns,
exact value equality. Strictly local tooling — not part of the library.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in idx))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in idx], out


class NonScalarCell(Exception):
    """Driver parity: the driver's pandas comparator cannot sort/hash
    list/struct/map cells (TypeError: unhashable type), so any nested
    value must be a hard FAIL here too — never canonicalized away."""


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
        raise NonScalarCell(f"non-scalar cell of type {type(v).__name__}: {v!r}")
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = sys.argv[3:] or None
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            r = con.execute(
                f"select * from read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in r.description]
            got = r.fetchall()
            r2 = con.execute(sql)
            exp_cols = [d[0] for d in r2.description]
            exp = r2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        try:
            gc, g = canon(got, got_cols)
            ec, e = canon(exp, exp_cols)
        except NonScalarCell as exc:
            print(f"FAIL {name}: {exc} (driver harness would crash on this)")
            n_fail += 1
            continue
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
        elif g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"FAIL {name}: first diff row {bad}:\n  got {g[bad]}\n  exp {e[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


def main_pandas(sf_dir, out_dir):
    """Driver-parity mode (`--pandas`): the driver compares through
    pandas frames (Spark parquet via pyarrow, oracle via duckdb .df()),
    so representation differences that fetchall-equality forgives —
    e.g. a Spark decimal column arriving as Decimal objects while
    DuckDB decays decimal to float64 — flip its hash. This mode is
    STRICTER than the driver: identical dtype kind + identical
    canonical string repr per cell, so a pass here implies a driver
    hash match."""
    import pandas as pd

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = sys.argv[3:] or None

    def canon_df(df):
        df = df.reindex(sorted(df.columns), axis=1)
        cells = df.astype(object).where(df.notna(), None)
        rows = sorted(
            [tuple(repr(norm(v)) for v in r) for r in cells.itertuples(index=False)])
        # dtype KIND (i/u/f/O/b/M), not exact width: int32-vs-int64 hashes
        # identically in pandas, float-vs-object (Decimal) does not
        return list(df.columns), [t.kind for t in df.dtypes], rows

    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.execute(sql).df()
            gc, gt, g = canon_df(got)
            ec, et, e = canon_df(exp)
        except Exception as exc:
            print(f"FAIL {name}: {exc}")
            n_fail += 1
            continue
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
        elif gt != et:
            print(f"FAIL {name}: dtypes {list(zip(gc, gt))} != {list(zip(ec, et))}")
        elif len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
        elif g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"FAIL {name}: first diff row {bad}:\n  got {g[bad]}\n  exp {e[bad]}")
        else:
            print(f"PASS {name} ({len(g)} rows, pandas-parity)")
            n_pass += 1
            continue
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail (pandas-parity)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if "--pandas" in sys.argv:
        sys.argv.remove("--pandas")
        sys.exit(main_pandas(sys.argv[1], sys.argv[2]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
