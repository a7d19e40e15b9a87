#!/usr/bin/env python3
"""CPU-throughput canary for the bench protocol.

The sandbox VM is a shared-host guest: r7's bench spread was poisoned
by a concurrent DuckDB replay, and r9 found runs where 32 spawned
burners achieved the throughput of ~15 cores (host overcommit shows up
here as phantom `sy` time in vmstat, invisible in per-process CPU).
Numbers measured in that state are not comparable with BASELINE.md.

Prints one line: `parallelism=<effective cores> verdict=<quiet|noisy>`.
Exit code 0 iff effective parallelism >= threshold (default 26).
Run before AND after every protocol measurement; discard the
measurement if either run says noisy.
"""
import multiprocessing as mp
import sys
import time

N = 20_000_000


def burn(_):
    t0 = time.perf_counter()
    x = 0
    for i in range(N):
        x += i * i
    return time.perf_counter() - t0


def main(threshold=26.0):
    single = burn(0)
    t0 = time.perf_counter()
    with mp.Pool(32) as p:
        p.map(burn, range(32))
    wall = time.perf_counter() - t0
    eff = single * 32 / wall
    verdict = "quiet" if eff >= threshold else "noisy"
    print(f"parallelism={eff:.1f} verdict={verdict}")
    return 0 if eff >= threshold else 1


if __name__ == "__main__":
    sys.exit(main(float(sys.argv[1]) if len(sys.argv) > 1 else 26.0))
