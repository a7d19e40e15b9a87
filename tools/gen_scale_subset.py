#!/usr/bin/env python3
"""gen_scale.py restricted to a table subset (disk-bounded sf300 spike).

The r14 scale-spike (VERDICT task 1) only reads the tables its 12 keys
touch: lineitem, orders, customer, supplier, nation, region, documents.
Skipping events/embeddings/part keeps sf300 under the sandbox's free
disk (~43 GB instead of ~51 GB).

Usage: gen_scale_subset.py <K> <outDir> <table> [table ...]
"""
import os
import sys

import gen_scale


def main():
    k, out = int(sys.argv[1]), sys.argv[2]
    tables = sys.argv[3:]
    os.makedirs(out, exist_ok=True)
    keep = {t: s for t, s in gen_scale.SHIFTS.items() if t in tables}
    missing = set(tables) - set(keep)
    if missing:
        sys.exit(f"unknown tables: {missing}")
    gen_scale.SHIFTS.clear()
    gen_scale.SHIFTS.update(keep)
    gen_scale.main(k, out)


if __name__ == "__main__":
    main()
