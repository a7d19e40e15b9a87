#!/usr/bin/env python3
"""Merge the r11 phase-2 patch rows into the sf100 Spark bench JSON.

The r11 port (native scaled-long dsum, d9 shingle sigs, d1/d1b binary
sigs) landed after the full sf100 Spark leg ran; phase 2 re-measured
every changed key in a targeted leg (spark_sf100patch.json). Patched
keys REPLACE the pre-port rows; the DuckDB sf100 leg needs no patch
(oracle SQL untouched). Prints the mk_baseline.py invocation.
"""
import json

OUT = "/tmp/baseline_r11"


def main():
    base_p = f"{OUT}/spark_sf100.json"
    base = json.load(open(base_p))
    patch = json.load(open(f"{OUT}/spark_sf100patch.json"))
    pre = {k: base["queries"].get(k) for k in patch["queries"]}
    for k, v in patch["queries"].items():
        base["queries"][k] = v
    fixed = {k for k, v in patch["queries"].items() if v is not None}
    base["failed"] = sorted(
        (set(base.get("failed", [])) - fixed) | set(patch.get("failed", [])))
    base["n_failed"] = len(base["failed"])
    base["patched_keys"] = sorted(patch["queries"].keys())
    base["value"] = sum(v for v in base["queries"].values() if v is not None)
    base["total_ok"] = base["value"]
    json.dump(base, open(base_p, "w"))
    print("pre -> post (sf100, port-changed keys):")
    for k in sorted(patch["queries"]):
        a, b = pre.get(k), patch["queries"][k]
        if a and b:
            print(f"  {k:26s} {a:8.2f} -> {b:8.2f}  ({a / b:4.1f}x)")
    sfs = ["sf0.1", "sf1", "sf10", "sf100"]
    args = " ".join(
        f"{sf}={OUT}/spark_{sf}.json,{OUT}/duck_{sf}.json" for sf in sfs)
    print(f"python3 tools/mk_baseline.py {args} "
          f"sf100-engine-gates={OUT}/spark_sf100c.json,{OUT}/duck_sf100c.json"
          f" > BASELINE.md")


if __name__ == "__main__":
    main()
