#!/usr/bin/env python3
"""Time a DuckDB replay of the oracle SQLs over a given sf directory.

This is the single-node baseline the judge compares BENCH numbers
against: the reference adapter delegates every query to DuckDB, so a
warm in-process DuckDB run of the same SQL over the same parquet is
the reference's best-case throughput (its real runs additionally pay
dbt's python orchestration per model).

One warm-up pass, then N (default 3) measured passes per query;
reports the per-query median as one JSON line, same shape as
graft.Bench. Strictly local benchmarking tooling.

Usage: bench_duckdb.py <sfDir> <oracle_sql.json> [runs]
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, oracle_path, runs=3):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    # GRAFT_EXCLUDE: comma-separated prefixes to skip, mirroring
    # graft.Bench's SPARK_GRAFT_EXCLUDE for like-for-like runs
    import os
    excl = [p for p in os.environ.get("GRAFT_EXCLUDE", "").split(",") if p]
    # GRAFT_ONLY mirrors SPARK_GRAFT_ONLY: restrict to these prefixes
    only = [p for p in os.environ.get("GRAFT_ONLY", "").split(",") if p]
    # Gate-scale-only oracles: driver gates that verify approximate
    # operators by recomputing the EXACT answer quadratically (all-pairs
    # jaccard / all-pairs cosine over the full table). Correct and cheap
    # at the sf0.01 correctness gate; structurally infeasible as a
    # timing replay at protocol SFs, where the Spark side keeps running
    # them (they land in the no-oracle bucket of mk_baseline, like any
    # Spark-only key). The authoritative list is declared per-Q in Scala
    # (Q.quadraticOracle) and dumped by graft.Verify as oracle_meta.json
    # next to oracle_sql.json — read it from there so a future quadratic
    # gate cannot be silently missing from a replay-side copy. The
    # hardcoded fallback only covers replaying a pre-r10 oracle dump.
    import os.path
    meta_path = os.path.join(os.path.dirname(oracle_path), "oracle_meta.json")
    if os.path.exists(meta_path):
        quadratic = set(json.load(open(meta_path))["quadratic_oracles"])
    else:
        print("bench_duckdb: no oracle_meta.json next to oracle dump; "
              "falling back to the pre-r10 hardcoded quadratic list",
              file=sys.stderr)
        quadratic = {"d2_dedup_minhash", "d4_dedup_simhash",
                     "d5b_embed_neardup_lsh", "d11_semdedup"}
    if os.environ.get("GRAFT_INCLUDE_QUADRATIC") == "1":
        quadratic = set()
    names = sorted(n for n in oracle
                   if not any(n.startswith(p) for p in excl)
                   and (not only or any(n.startswith(p) for p in only))
                   and n not in quadratic)
    for name in names:  # warm-up (OS page cache, duckdb readers)
        con.execute(oracle[name]).fetchall()
    samples = {n: [] for n in names}
    for _ in range(runs):
        for name in names:
            t0 = time.perf_counter()
            con.execute(oracle[name]).fetchall()
            samples[name].append(time.perf_counter() - t0)
    med = {n: statistics.median(samples[n]) for n in names}
    spread = max((max(s) - min(s)) / med[n] if med[n] > 0 else 0.0
                 for n, s in samples.items())
    print(json.dumps({"metric": "total", "value": sum(med.values()),
                      "unit": "sec", "queries": med, "sf": sf_dir,
                      "runs": runs, "spread": spread}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
