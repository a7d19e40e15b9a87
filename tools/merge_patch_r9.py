#!/usr/bin/env python3
"""Merge the r9 patch-leg rows (keys added/fixed after the main
protocol run) into the per-SF bench JSONs, then print the
mk_baseline.py invocation. Patched keys REPLACE any existing row for
the same key (e.g. q63's null failure rows from the pre-fix run).
"""
import json
import sys

OUT = "/tmp/baseline_r9"
SFS = ["sf0.1", "sf1", "sf10", "sf100"]


def merge(base_p, patch_p):
    base = json.load(open(base_p))
    patch = json.load(open(patch_p))
    for k, v in patch["queries"].items():
        base["queries"][k] = v
    # failed lists: drop keys the patch now measures, add patch fails
    fixed = {k for k, v in patch["queries"].items() if v is not None}
    base["failed"] = sorted(
        (set(base.get("failed", [])) - fixed) | set(patch.get("failed", [])))
    base["n_failed"] = len(base["failed"])
    base["patched_keys"] = sorted(patch["queries"].keys())
    json.dump(base, open(base_p, "w"))


def main():
    for sf in SFS:
        for side in ("spark", "duck"):
            merge(f"{OUT}/{side}_{sf}.json", f"{OUT}/{side}_patch_{sf}.json")
        print(f"merged {sf}")
    args = " ".join(
        f"{sf}={OUT}/spark_{sf}.json,{OUT}/duck_{sf}.json" for sf in SFS)
    print(f"python3 tools/mk_baseline.py {args} "
          f"sf100-engine-gates={OUT}/spark_sf100c.json,{OUT}/duck_sf100c.json"
          f" > BASELINE.md")


if __name__ == "__main__":
    main()
